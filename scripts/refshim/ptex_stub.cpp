// Stub for textures/ptex.cpp: the reference's Ptex submodule is not
// vendored in this checkout, and the benchmark scenes don't use ptex.
// Keeps the symbols api.cpp links against; using a ptex texture errors.
#include "textures/ptex.h"

#include "error.h"
#include "interaction.h"
#include "paramset.h"

namespace pbrt {

template <typename T>
PtexTexture<T>::PtexTexture(const std::string &filename, Float gamma)
    : valid(false), filename(filename), gamma(gamma) {
    Error("ptex support not compiled into this benchmark build (%s)",
          filename.c_str());
}

template <typename T>
PtexTexture<T>::~PtexTexture() {}

template <typename T>
T PtexTexture<T>::Evaluate(const SurfaceInteraction &) const {
    return T(0.f);
}

template class PtexTexture<Float>;
template class PtexTexture<Spectrum>;

PtexTexture<Float> *CreatePtexFloatTexture(const Transform &tex2world,
                                           const TextureParams &tp) {
    return new PtexTexture<Float>(tp.FindFilename("filename"),
                                  tp.FindFloat("gamma", 2.2f));
}

PtexTexture<Spectrum> *CreatePtexSpectrumTexture(const Transform &tex2world,
                                                 const TextureParams &tp) {
    return new PtexTexture<Spectrum>(tp.FindFilename("filename"),
                                     tp.FindFloat("gamma", 2.2f));
}

}  // namespace pbrt
