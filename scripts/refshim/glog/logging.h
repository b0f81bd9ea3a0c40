// Minimal glog shim so the reference pbrt builds without the (empty)
// src/ext/glog submodule.  Implements the subset the reference uses:
// LOG/VLOG streams, CHECK/DCHECK families, InitGoogleLogging, and the
// handful of FLAGS_ globals main/pbrt.cpp sets.  Logging below FATAL is
// swallowed (benchmarking builds don't want log IO anyway).
#ifndef GLOG_SHIM_LOGGING_H
#define GLOG_SHIM_LOGGING_H

#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

namespace glog_shim {

// stream that swallows everything
class NullStream {
  public:
    template <typename T>
    NullStream &operator<<(const T &) { return *this; }
    NullStream &operator<<(std::ostream &(*)(std::ostream &)) {
        return *this;
    }
};

// stream that prints to stderr and aborts at end of statement
class FatalStream {
  public:
    FatalStream(const char *file, int line) {
        ss_ << "FATAL " << file << ":" << line << ": ";
    }
    template <typename T>
    FatalStream &operator<<(const T &v) { ss_ << v; return *this; }
    FatalStream &operator<<(std::ostream &(*)(std::ostream &)) {
        return *this;
    }
    [[noreturn]] ~FatalStream() {
        std::cerr << ss_.str() << std::endl;
        std::abort();
    }
  private:
    std::ostringstream ss_;
};

inline NullStream &null_stream() {
    static NullStream ns;
    return ns;
}

// lower-precedence-than-<< void adapter (the classic glog trick), so
// CHECK can live in a ternary whose arms are both void
class Voidify {
  public:
    void operator&(FatalStream &) {}
    void operator&(NullStream &) {}
};

}  // namespace glog_shim

// severity tags (values match glog)
#define GLOG_SHIM_INFO 0
#define GLOG_SHIM_WARNING 1
#define GLOG_SHIM_ERROR 2
#define GLOG_SHIM_FATAL 3

#define LOG_INFO ::glog_shim::null_stream()
#define LOG_WARNING ::glog_shim::null_stream()
#define LOG_ERROR ::glog_shim::null_stream()
#define LOG_FATAL ::glog_shim::FatalStream(__FILE__, __LINE__)
#define LOG(severity) LOG_##severity

// debug builds: VLOG prints to stderr while glog_shim::vlog_on is set
// (the refdbg integrator copy raises it inside a target pixel)
namespace glog_shim {
inline bool vlog_on = false;
class VStream {
  public:
    template <typename T>
    VStream &operator<<(const T &v) {
        if (vlog_on) std::cerr << v;
        return *this;
    }
    VStream &operator<<(std::ostream &(*m)(std::ostream &)) {
        if (vlog_on) std::cerr << m;
        return *this;
    }
};
inline VStream &vstream() {
    static VStream vs;
    return vs;
}
}  // namespace glog_shim
#define VLOG(n) ::glog_shim::vstream()
#define VLOG_IS_ON(n) ::glog_shim::vlog_on
#define DLOG(severity) ::glog_shim::null_stream()

#define CHECK(cond)                                                     \
    (cond) ? (void)0                                                    \
           : ::glog_shim::Voidify() &                                   \
                 ::glog_shim::FatalStream(__FILE__, __LINE__)           \
                     << "Check failed: " #cond " "
#define CHECK_OP(a, b, op) CHECK((a)op(b))
#define CHECK_EQ(a, b) CHECK_OP(a, b, ==)
#define CHECK_NE(a, b) CHECK_OP(a, b, !=)
#define CHECK_LT(a, b) CHECK_OP(a, b, <)
#define CHECK_LE(a, b) CHECK_OP(a, b, <=)
#define CHECK_GT(a, b) CHECK_OP(a, b, >)
#define CHECK_GE(a, b) CHECK_OP(a, b, >=)

#ifdef NDEBUG
#define DCHECK(cond) CHECK(true || (cond))
#else
#define DCHECK(cond) CHECK(cond)
#endif
#define DCHECK_EQ(a, b) DCHECK((a) == (b))
#define DCHECK_NE(a, b) DCHECK((a) != (b))
#define DCHECK_LT(a, b) DCHECK((a) < (b))
#define DCHECK_LE(a, b) DCHECK((a) <= (b))
#define DCHECK_GT(a, b) DCHECK((a) > (b))
#define DCHECK_GE(a, b) DCHECK((a) >= (b))

template <typename T>
inline T *CheckNotNull(const char *file, int line, const char *msg, T *p) {
    if (p == nullptr)
        ::glog_shim::FatalStream(file, line) << msg;
    return p;
}
#define CHECK_NOTNULL(p) CheckNotNull(__FILE__, __LINE__, #p " is null", (p))

// FLAGS_ globals referenced by main/pbrt.cpp (inline: C++17 single def)
inline int FLAGS_stderrthreshold = 1;
inline int FLAGS_minloglevel = 0;
inline int FLAGS_v = 0;
inline bool FLAGS_logtostderr = false;
inline std::string FLAGS_log_dir;

namespace google {
inline void InitGoogleLogging(const char *) {}
inline void ShutdownGoogleLogging() {}
}  // namespace google

#endif  // GLOG_SHIM_LOGGING_H
