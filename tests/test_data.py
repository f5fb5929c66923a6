"""Data-layer tests: solvers (physics sanity), SH transforms, cache, loader."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enf_pde_tpu.data.cache import TrajectoryCache, test_seed as split_seed
from enf_pde_tpu.data.cahn_hilliard import cahn_hilliard_rollout
from enf_pde_tpu.data.diffusion_plane import diffusion_frames, sample_source
from enf_pde_tpu.data.diffusion_sphere import (
    generate_sphere_diffusion_trajectories,
    reference_frame_times,
)
from enf_pde_tpu.data.loader import TrajectoryLoader
from enf_pde_tpu.data.navier_stokes import (
    GaussianRF2D,
    default_forcing,
    navier_stokes_rollout,
)
from enf_pde_tpu.data.sphere_harmonics import SphereGrid


# ---------------------------------------------------------------- Navier-Stokes


def test_grf_sampler_statistics():
    s = GaussianRF2D(64)
    fields = s.sample(jax.random.PRNGKey(0), 8)
    assert fields.shape == (8, 64, 64)
    # Zero mean (k=0 mode removed) and smooth (power-law spectrum).
    np.testing.assert_allclose(np.asarray(fields.mean(axis=(1, 2))), 0.0, atol=1e-4)
    grad = jnp.abs(jnp.diff(fields, axis=-1)).mean()
    amp = jnp.abs(fields).mean()
    assert float(grad) < float(amp)  # smoother than white noise


def test_ns_solver_conserves_mean_vorticity():
    """Mean vorticity evolves only through the (zero-mean) forcing; stays ~0."""
    s = GaussianRF2D(32)
    w0 = s.sample(jax.random.PRNGKey(1), 2)
    f = default_forcing(32)
    snaps, w_final = navier_stokes_rollout(
        w0, f, visc=1e-3, delta_t=1e-3, record_steps=3, steps_per_record=200
    )
    assert snaps.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(np.asarray(snaps[:, 0]), np.asarray(w0), atol=1e-5)
    means = np.asarray(snaps.mean(axis=(2, 3)))
    np.testing.assert_allclose(means, 0.0, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(w_final)))


def test_ns_solver_viscous_decay_unforced():
    """Without forcing, enstrophy must decay monotonically."""
    s = GaussianRF2D(32)
    w0 = s.sample(jax.random.PRNGKey(2), 1)
    snaps, _ = navier_stokes_rollout(
        w0, jnp.zeros((32, 32)), visc=1e-2, delta_t=1e-3, record_steps=4, steps_per_record=250
    )
    enstrophy = np.asarray((snaps**2).mean(axis=(2, 3)))[0]
    assert np.all(np.diff(enstrophy) < 0)


def test_splitfft_matches_jnp_fft():
    """Split-complex matmul DFTs reproduce jnp.fft bit-for-tolerance."""
    from enf_pde_tpu.data.splitfft import (
        dft_matrices,
        fft2_real_input,
        fft2_split,
        ifft2_real_output,
        ifft2_split,
    )

    rng = np.random.RandomState(0)
    x = (rng.randn(3, 32, 32) + 1j * rng.randn(3, 32, 32)).astype(np.complex64)
    C, S = dft_matrices(32)
    re, im = fft2_split(jnp.asarray(x.real), jnp.asarray(x.imag), C, S)
    ref = np.fft.fftn(x, axes=(-2, -1))
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3)

    re_b, im_b = ifft2_split(re, im, C, S)
    np.testing.assert_allclose(np.asarray(re_b), x.real, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im_b), x.imag, atol=1e-4)

    xr = rng.randn(2, 32, 32).astype(np.float32)
    re, im = fft2_real_input(jnp.asarray(xr), C, S)
    ref = np.fft.fftn(xr, axes=(-2, -1))
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(ifft2_real_output(re, im, C, S)), xr, atol=1e-4
    )


def test_grf_sample_split_matches_complex():
    """sample_split draws the identical field as sample (same key), sans complex."""
    s = GaussianRF2D(32)
    a = np.asarray(s.sample(jax.random.PRNGKey(3), 4))
    b = np.asarray(s.sample_split(jax.random.PRNGKey(3), 4))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_grf_batch_sampler_matches_per_key_sample():
    """The jitted batch sampler used by split-FFT generation draws the same
    per-key fields as ``sample(key, 1)[0]`` — cache determinism depends on it."""
    from enf_pde_tpu.data.navier_stokes import _grf_sample_split_batch

    s = GaussianRF2D(32)
    seeds = [7, 11, 123456]
    keys = jnp.asarray(np.stack([np.asarray(jax.random.PRNGKey(k)) for k in seeds]))
    batch = np.asarray(_grf_sample_split_batch(s.sqrt_eig, keys))
    for i, seed in enumerate(seeds):
        one = np.asarray(s.sample(jax.random.PRNGKey(seed), 1)[0])
        np.testing.assert_allclose(batch[i], one, atol=2e-4)


def test_ns_rollout_split_matches_complex():
    """Short split-FFT rollouts track the complex solver to f32 roundoff."""
    from enf_pde_tpu.data.navier_stokes import navier_stokes_rollout_split

    s = GaussianRF2D(32)
    w0 = s.sample(jax.random.PRNGKey(4), 2)
    f = default_forcing(32)
    kw = dict(visc=1e-3, delta_t=1e-3, record_steps=3, steps_per_record=100)
    snaps_c, fin_c = navier_stokes_rollout(w0, f, **kw)
    snaps_s, fin_s = navier_stokes_rollout_split(w0, f, **kw)
    scale = float(np.abs(np.asarray(snaps_c)).max())
    np.testing.assert_allclose(
        np.asarray(snaps_s), np.asarray(snaps_c), atol=2e-3 * scale
    )
    np.testing.assert_allclose(np.asarray(fin_s), np.asarray(fin_c), atol=2e-3 * scale)


# ---------------------------------------------------------------- planar diffusion


def test_diffusion_plane_heat_kernel_vs_fd():
    """Exact heat-kernel frames match an explicit finite-difference integrator."""
    x0, y0, value = sample_source(0)
    size = 32
    frames = np.asarray(diffusion_frames(x0, y0, value, t_start=3.5, dt=0.5, num_frames=3, size=size))

    # FD integration of the same IC.
    cell = 6.0 / size
    u = np.zeros((size, size))
    ix = int(np.clip(np.floor((x0 + 3) / cell), 0, size - 1))
    iy = int(np.clip(np.floor((y0 + 3) / cell), 0, size - 1))
    u[ix, iy] = value / cell**2
    D, dt_fd = 0.1, 0.02
    lap = np.zeros_like(u)
    for _ in range(int(3.5 / dt_fd)):
        lap[1:-1, 1:-1] = (
            u[2:, 1:-1] + u[:-2, 1:-1] + u[1:-1, 2:] + u[1:-1, :-2] - 4 * u[1:-1, 1:-1]
        )
        lap[0], lap[-1], lap[:, 0], lap[:, -1] = 0, 0, 0, 0  # crude no-flux interior test
        u = u + dt_fd * D * lap / cell**2
    # Compare away from boundaries (heat kernel is free-space).
    err = np.abs(frames[0][4:-4, 4:-4] - u[4:-4, 4:-4]).max()
    scale = frames[0].max()
    assert err < 0.15 * scale, f"FD mismatch: {err} vs peak {scale}"


def test_diffusion_plane_mass_and_ood_split():
    x0, y0, v = sample_source(3, test=False)
    assert 0 <= y0 <= 2
    x0t, y0t, vt = sample_source(3, test=True)
    assert -2 <= y0t <= 0
    frames = np.asarray(diffusion_frames(x0, y0, v, 3.5, 0.5, 5))
    cell = 6.0 / 64
    mass = frames.sum(axis=(1, 2)) * cell**2
    np.testing.assert_allclose(mass, v, rtol=1e-2)  # heat is conserved


# ---------------------------------------------------------------- Cahn-Hilliard


def test_cahn_hilliard_conserves_mass_and_coarsens():
    c0 = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32), minval=-1, maxval=1)
    snaps = cahn_hilliard_rollout(c0, dt=1e-2, record_steps=4, steps_per_record=2000)
    assert snaps.shape == (2, 4, 32, 32)
    masses = np.asarray(snaps.mean(axis=(2, 3)))
    np.testing.assert_allclose(
        masses, np.broadcast_to(masses[:, :1], masses.shape), atol=1e-4
    )  # conserved order parameter
    # Phase separation: field moves toward the +-1 wells.
    m0 = np.abs(np.asarray(snaps[:, 0])).mean()
    m3 = np.abs(np.asarray(snaps[:, -1])).mean()
    assert m3 > m0
    assert np.asarray(snaps).max() < 1.5  # bounded


# ---------------------------------------------------------------- sphere harmonics


def test_sh_roundtrip():
    g = SphereGrid(32, 16)
    key = jax.random.PRNGKey(0)
    flm = jax.random.normal(key, (g.lmax + 1, g.mmax + 1)) * (
        1.0 + 0j
    ) + 1j * jax.random.normal(jax.random.PRNGKey(1), (g.lmax + 1, g.mmax + 1))
    # Valid coefficients: only l >= m, real for m=0.
    L = np.arange(g.lmax + 1)[:, None]
    M = np.arange(g.mmax + 1)[None, :]
    flm = jnp.where(L >= M, flm, 0.0)
    flm = flm.at[:, 0].set(flm[:, 0].real + 0j)
    f = g.synthesis(flm)
    flm2 = g.analysis(f)
    np.testing.assert_allclose(np.asarray(flm2), np.asarray(flm), atol=1e-4)
    f2 = g.synthesis(flm2)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f), atol=1e-4)


def test_sh_constant_and_y10():
    g = SphereGrid(16, 8)
    const = jnp.ones((16, 8))
    flm = g.analysis(const)
    # <1, Y_00> = sqrt(4 pi)
    np.testing.assert_allclose(float(flm[0, 0].real), np.sqrt(4 * np.pi), rtol=1e-5)
    f = g.synthesis(flm)
    np.testing.assert_allclose(np.asarray(f), 1.0, atol=1e-5)


def test_sphere_diffusion_decays_and_conserves_mean():
    trajs = generate_sphere_diffusion_trajectories(np.arange(1), nphi=32, ntheta=16)
    assert trajs.shape == (1, 20, 32, 16, 1)
    t = trajs[0, :, :, :, 0]
    # Peak decays monotonically with time.
    peaks = t.max(axis=(1, 2))
    assert np.all(np.diff(peaks[1:]) < 0)
    # Mean over the sphere (area-weighted) is conserved.
    g = SphereGrid(32, 16)
    w = g.w[None, None, :]
    means = (t * w).sum(axis=2).mean(axis=1) / 2  # integral / area factor
    np.testing.assert_allclose(means, means[0], rtol=1e-4)
    ts = reference_frame_times()
    assert ts[0] == 0.0 and ts[1] == 0.5 and ts[2] == 5.5


# ---------------------------------------------------------------- cache + loader


def test_cache_and_loader(tmp_path):
    calls = []

    def gen(ids):
        calls.append(list(ids))
        return np.stack([np.full((4, 3, 3, 1), float(i)) for i in ids])

    cache = TrajectoryCache(str(tmp_path / "c"), gen, batch_size_gen=4)
    t2 = cache.get(2)
    np.testing.assert_allclose(t2, 2.0)
    assert calls == [[0, 1, 2, 3]]  # block-generated once
    cache.get(1)
    assert len(calls) == 1  # from disk

    loader = TrajectoryLoader(
        cache.get, indices=range(4), coords=np.zeros((9, 2)), batch_size=2, shuffle=True
    )
    batches = list(loader)
    assert len(batches) == 2
    traj, coords, ids = batches[0]
    assert traj.shape == (2, 4, 3, 3, 1)
    assert coords.shape == (9, 2)
    assert split_seed(0) == np.iinfo(np.int32).max
