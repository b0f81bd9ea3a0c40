"""Generate pbrt_tpu/data/rgb2spect.npz: the Smits RGB->spectrum basis
tables resampled to our 31 bins.

The numeric tables are published constants from pbrt-v3 (BSD-2; Pharr,
Jakob & Humphreys, "Physically Based Rendering", spectrum.cpp
RGBRefl2Spect* / RGBIllum2Spect* at spectrum.cpp:1061+), precomputed by
the authors with Smits' (1999) method.  We extract them as DATA from
the reference checkout's source text and resample exactly like
SampledSpectrum::Init (spectrum.cpp:1364: piecewise-linear average over
each bin) so our from_rgb matches the reference's spectral renders
band-for-band.  Run: python scripts/gen_rgb2spect.py
"""

import re

import numpy as np

SRC = "/root/reference/src/core/spectrum.cpp"
OUT = "pbrt_tpu/data/rgb2spect.npz"
LAMBDA_START, LAMBDA_END, N = 395.0, 705.0, 31

NAMES = ["White", "Cyan", "Magenta", "Yellow", "Red", "Green", "Blue"]


def extract_array(text, name):
    m = re.search(r"const Float %s\[nRGB2SpectSamples\] = \{(.*?)\};"
                  % re.escape(name), text, re.S)
    if m is None:
        raise SystemExit(f"table {name} not found in {SRC}")
    vals = [float(x) for x in re.findall(r"[-+0-9.eE]+", m.group(1))]
    return np.asarray(vals, np.float64)


def average_samples(lam, vals, l0, l1):
    """Average of the piecewise-linear (lam, vals) curve over [l0, l1]
    (reference AverageSpectrumSamples, spectrum.cpp:59-85: constant
    extension outside the sample range)."""
    if l1 <= lam[0]:
        return vals[0]
    if l0 >= lam[-1]:
        return vals[-1]
    if len(lam) == 1:
        return vals[0]
    s = 0.0
    if l0 < lam[0]:
        s += vals[0] * (lam[0] - l0)
    if l1 > lam[-1]:
        s += vals[-1] * (l1 - lam[-1])

    def interp(w, i):
        t = (w - lam[i]) / (lam[i + 1] - lam[i])
        return (1 - t) * vals[i] + t * vals[i + 1]

    i = 0
    while l0 > lam[i + 1]:
        i += 1
    while i + 1 < len(lam) and l1 >= lam[i]:
        sl0 = max(l0, lam[i])
        sl1 = min(l1, lam[i + 1])
        if sl1 > sl0:
            s += 0.5 * (interp(sl0, i) + interp(sl1, i)) * (sl1 - sl0)
        i += 1
    return s / (l1 - l0)


def main():
    text = open(SRC).read()
    lam = extract_array(text, "RGB2SpectLambda")
    out = {}
    edges = np.linspace(LAMBDA_START, LAMBDA_END, N + 1)
    for prefix, key in (("RGBRefl2Spect", "refl"), ("RGBIllum2Spect",
                                                    "illum")):
        for name in NAMES:
            vals = extract_array(text, prefix + name)
            binned = np.asarray([
                average_samples(lam, vals, edges[i], edges[i + 1])
                for i in range(N)], np.float64)
            out[f"{key}_{name.lower()}"] = binned.astype(np.float32)
    # the FromRGB trailing scales (spectrum.cpp:138, :172)
    out["refl_scale"] = np.float32(0.94)
    out["illum_scale"] = np.float32(0.86445)
    np.savez(OUT, **out)
    print(f"wrote {OUT}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main()
