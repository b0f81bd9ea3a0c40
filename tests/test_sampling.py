"""Sampler/LDS/distribution tests (model: reference src/tests/sampling.cpp)."""
import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import lds, rng, sampling


def test_sobol_dim0_is_van_der_corput():
    idx = jnp.arange(8, dtype=jnp.uint32)
    x = np.asarray(lds.sobol_sample(idx, 0))
    assert np.allclose(sorted(x), [0, 1/8, 2/8, 3/8, 4/8, 5/8, 6/8, 7/8],
                       atol=1e-6)


def test_sobol_elementary_intervals():
    # first 2^4 points of (dim0, dim1) must be a (0,4,2)-net: every
    # 4x4 stratification cell contains exactly one point
    n = 16
    idx = jnp.arange(n, dtype=jnp.uint32)
    x = np.asarray(lds.sobol_sample(idx, 0))
    y = np.asarray(lds.sobol_sample(idx, 1))
    cells = set()
    for xi, yi in zip(x, y):
        cells.add((int(xi * 4), int(yi * 4)))
    assert len(cells) == 16


def test_sobol_uniform_mean():
    idx = jnp.arange(1024, dtype=jnp.uint32)
    for d in [0, 1, 5, 64, 200]:
        x = np.asarray(lds.sobol_sample(idx, d))
        assert 0.48 < x.mean() < 0.52, (d, x.mean())
        assert x.min() >= 0 and x.max() < 1


def test_owen_scrambled_sobol_still_uniform():
    idx = jnp.arange(1024, dtype=jnp.uint32)
    seed = jnp.uint32(1234)
    x = np.asarray(lds.sobol_sample(idx, 3, scramble_seed=seed))
    assert 0.47 < x.mean() < 0.53
    x2 = np.asarray(lds.sobol_sample(idx, 3, scramble_seed=jnp.uint32(99)))
    assert not np.allclose(x, x2)


def test_radical_inverse_base2():
    idx = jnp.arange(8, dtype=jnp.uint32)
    x = np.asarray(lds.radical_inverse_base2(idx))
    assert np.allclose(x, [0, .5, .25, .75, .125, .625, .375, .875], atol=1e-6)


def test_radical_inverse_base3():
    x = np.asarray(lds.radical_inverse(jnp.arange(9, dtype=jnp.uint32), 3))
    expected = [0, 1/3, 2/3, 1/9, 4/9, 7/9, 2/9, 5/9, 8/9]
    assert np.allclose(x, expected, atol=1e-5)


def test_halton_2d_stratified():
    idx = jnp.arange(1000, dtype=jnp.uint32)
    x = np.asarray(lds.halton_sample(idx, 0))
    y = np.asarray(lds.halton_sample(idx, 1))
    assert 0.45 < x.mean() < 0.55 and 0.45 < y.mean() < 0.55
    # discrepancy sanity: every 1/5 stratum occupied
    assert len(set((x * 5).astype(int))) == 5


def test_hash_float_uniform():
    i = jnp.arange(4096, dtype=jnp.uint32)
    u = np.asarray(rng.uniform_float(i, jnp.uint32(7)))
    assert 0.48 < u.mean() < 0.52
    assert abs(np.var(u) - 1 / 12) < 0.005


def test_distribution_1d():
    f = jnp.asarray([1.0, 1.0, 2.0, 4.0, 8.0])
    cdf, fint = sampling.build_distribution_1d(f)
    assert np.isclose(float(fint), 16 / 5)
    u = jnp.asarray(np.random.RandomState(0).rand(20000).astype(np.float32))
    x, pdf, _ = sampling.sample_distribution_1d_continuous(cdf, fint, f, u)
    x = np.asarray(x)
    # histogram should match f
    h, _ = np.histogram(x, bins=5, range=(0, 1))
    h = h / h.sum() * 5
    assert np.allclose(h, np.asarray(f) / float(fint), atol=0.1)


def test_distribution_discrete():
    f = jnp.asarray([0.0, 3.0, 1.0])
    cdf, fint = sampling.build_distribution_1d(f)
    u = jnp.asarray(np.random.RandomState(1).rand(10000).astype(np.float32))
    idx, pmf = sampling.sample_distribution_1d_discrete(cdf, fint, f, u)
    idx = np.asarray(idx)
    assert (idx == 0).sum() == 0
    assert abs((idx == 1).mean() - 0.75) < 0.02


def test_concentric_disk_in_unit_disk():
    u = np.random.RandomState(2).rand(5000, 2).astype(np.float32)
    d = np.asarray(sampling.concentric_sample_disk(
        jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    r = np.hypot(d[:, 0], d[:, 1])
    assert r.max() <= 1.0 + 1e-5
    assert abs((r < 0.5).mean() - 0.25) < 0.03  # area-uniform


def test_cosine_hemisphere_mean_cos():
    u = np.random.RandomState(3).rand(20000, 2).astype(np.float32)
    w = np.asarray(sampling.cosine_sample_hemisphere(
        jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    assert np.all(w[:, 2] >= -1e-6)
    # E[cos theta] under cos-weighted pdf = 2/3
    assert abs(w[:, 2].mean() - 2 / 3) < 0.01


def test_power_heuristic():
    w = sampling.power_heuristic(1.0, jnp.asarray(2.0), 1.0, jnp.asarray(1.0))
    assert np.isclose(float(w), 4 / 5)


def test_distribution_2d():
    f = jnp.asarray(np.outer([1, 2, 3, 4.0], [1, 1, 2, 2.0]).astype(np.float32))
    d2 = sampling.Distribution2D(f)
    u = np.random.RandomState(4).rand(20000, 2).astype(np.float32)
    (us, vs), pdf = d2.sample(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    us, vs, pdf = map(np.asarray, (us, vs, pdf))
    assert us.min() >= 0 and us.max() <= 1 and pdf.min() > 0
    # v marginal ~ [1,2,3,4]/10
    h, _ = np.histogram(vs, bins=4, range=(0, 1))
    assert np.allclose(h / h.sum(), np.array([1, 2, 3, 4]) / 10, atol=0.02)
    # pdf consistency at sampled points
    pdf2 = np.asarray(d2.pdf(jnp.asarray(us), jnp.asarray(vs)))
    assert np.allclose(pdf, pdf2, rtol=1e-3, atol=1e-3)


def test_maxmindist_generator_matrix_set():
    """maxmindist pixel samples must be exactly the reference's point set:
    dim0 = {i/spp}, dim1 = {MultiplyGenerator(CMaxMinDist[log2 spp], i)}
    (maxmin.cpp StartPixel; the per-pixel shuffle only permutes order)."""
    import numpy as np
    import jax.numpy as jnp
    from pbrt_tpu.samplers.samplers import SamplerConfig, sample_dim
    from pbrt_tpu.core import lds
    spp = 16
    cfg = SamplerConfig(kind="maxmindist", seed=3, spp=spp)
    pid = jnp.full(spp, 77, jnp.uint32)
    sidx = jnp.arange(spp, dtype=jnp.uint32)
    x = np.sort(np.asarray(sample_dim(cfg, pid, sidx, 0)))
    y = np.sort(np.asarray(sample_dim(cfg, pid, sidx, 1)))
    assert np.allclose(x, np.arange(spp) / spp, atol=1e-6)
    C = lds.maxmin_matrix(4)
    ref = []
    for i in range(spp):
        v = 0
        for b in range(32):
            if (i >> b) & 1:
                v ^= int(C[b])
        ref.append(v * 2.3283064365386963e-10)
    assert np.allclose(y, np.sort(ref), atol=1e-6)
    # different pixels get different orderings (the keyed bijection)
    x2 = np.asarray(sample_dim(cfg, jnp.full(spp, 91, jnp.uint32), sidx, 0))
    assert not np.allclose(x2, np.asarray(sample_dim(cfg, pid, sidx, 0)))
    # dim0/dim1 pairing is the matrix construction: the pair set must be
    # (i/spp, MG(C, i)) for the SAME index i
    xi = np.asarray(sample_dim(cfg, pid, sidx, 0))
    yi = np.asarray(sample_dim(cfg, pid, sidx, 1))
    for a, b in zip(xi, yi):
        i = int(round(a * spp))
        assert np.isclose(b, ref[i], atol=1e-6)
