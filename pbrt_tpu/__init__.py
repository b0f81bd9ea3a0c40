"""pbrt_tpu — a TPU-native differentiable spectral path tracer in JAX.

A from-scratch re-design of the capabilities of scienstanford/pbrt-v3-spectral
(the Stanford ISET3d spectral fork of pbrt-v3) for TPU hardware:

* All radiometry is carried as 31-bin sampled spectra over 395-705 nm
  (reference: src/core/spectrum.h:48-50, src/core/pbrt.h:126-133) as the
  trailing axis of SoA tensors.
* Rendering is a wavefront path tracer: fixed-shape ray/path-state batches
  advanced by `lax.scan` over bounce depth, with XLA/Pallas kernels for
  BVH traversal, BSDF evaluation, next-event estimation and film splatting
  (reference hot loop: src/core/integrator.cpp:228-342, src/integrators/path.cpp:64).
* Scenes are parsed with the pbrt grammar (src/core/parser.cpp) into a flat
  SceneIR of device tensors (BVH nodes, triangle SoA, material/light tables).
* Parallelism is `shard_map` over a `jax.sharding.Mesh` (rays + film tiles
  sharded, scene replicated) instead of the reference's pthread tile pool
  (src/core/parallel.cpp:184-322).
* Unlike the reference, the renderer is reverse-mode differentiable w.r.t.
  material / emission / camera parameters.
"""

__version__ = "0.1.0"

from pbrt_tpu.core import spectrum  # noqa: F401
