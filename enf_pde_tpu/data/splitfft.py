"""Split-complex 2D DFT as real matmuls, for accelerators without complex support.

The axon remote-TPU platform rejects complex dtypes (``tools/pregen_ns_tpu.py
--probe`` dies in ``UNIMPLEMENTED`` on ``jnp.fft``), which confined the
Navier-Stokes spectral solver (``data/navier_stokes.py``) to ~15 s/trajectory
single-core CPU generation. For the solver's 64x64 grids a length-64 DFT is a
tiny dense matmul, so the transform maps straight onto the MXU: represent
spectral states as (re, im) plane pairs and apply the DFT matrix per axis with
``precision=HIGHEST`` real matmuls. A full 2D complex FFT costs 8 batched
[N,N]@[N,N] matmuls — at batch 512 these are MXU-shaped and the whole CN solver
step stays on-device with no complex ops anywhere.

Convention matches ``jnp.fft``: forward ``F_jk = exp(-2i pi jk / N)`` (no
normalization), inverse ``(1/N) exp(+2i pi jk / N)``. The reference generates
this dataset host-side with a complex-FFT solver (``pdes.py:186-303``); this
module exists so the same physics can batch-generate on the TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dft_matrices",
    "fft2_split",
    "ifft2_split",
    "fft2_real_input",
    "ifft2_real_output",
]

_PREC = jax.lax.Precision.HIGHEST


def dft_matrices(n: int, dtype=jnp.float32):
    """Return ``(C, S)`` with ``C_jk = cos(2 pi jk / n)``, ``S_jk = sin(2 pi jk / n)``.

    Both are symmetric, so applying the DFT along either tensor axis uses the
    same matrix. Computed in float64 on host for coefficient accuracy.
    """
    jk = np.outer(np.arange(n), np.arange(n)).astype(np.float64)
    ang = 2.0 * np.pi * jk / n
    return jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype)


def _apply_last(m, x):
    return jnp.einsum("...j,jk->...k", x, m, precision=_PREC)


def _apply_secondlast(m, x):
    return jnp.einsum("jk,...jl->...kl", m, x, precision=_PREC)


def _fft1(a, b, C, S, apply):
    """One forward-DFT axis of ``a + i b``: multiply by ``F = C - i S``."""
    re = apply(C, a) + apply(S, b)
    im = apply(C, b) - apply(S, a)
    return re, im


def _ifft1(a, b, C, S, apply, n):
    """One inverse-DFT axis: multiply by ``(C + i S) / n``."""
    re = (apply(C, a) - apply(S, b)) / n
    im = (apply(C, b) + apply(S, a)) / n
    return re, im


def fft2_split(a, b, C, S):
    """2D forward DFT of ``a + i b`` over the last two axes -> ``(re, im)``."""
    a, b = _fft1(a, b, C, S, _apply_last)
    return _fft1(a, b, C, S, _apply_secondlast)


def ifft2_split(a, b, C, S):
    """2D inverse DFT of ``a + i b`` over the last two axes -> ``(re, im)``."""
    n = C.shape[0]
    a, b = _ifft1(a, b, C, S, _apply_last, n)
    return _ifft1(a, b, C, S, _apply_secondlast, n)


def fft2_real_input(x, C, S):
    """2D forward DFT of a real field -> ``(re, im)``; skips the zero plane on axis -1."""
    re = _apply_last(C, x)
    im = -_apply_last(S, x)
    return _fft1(re, im, C, S, _apply_secondlast)


def ifft2_real_output(a, b, C, S):
    """Real part of the 2D inverse DFT of ``a + i b``; skips the imag plane on axis -2."""
    n = C.shape[0]
    a, b = _ifft1(a, b, C, S, _apply_last, n)
    return (_apply_secondlast(C, a) - _apply_secondlast(S, b)) / n
