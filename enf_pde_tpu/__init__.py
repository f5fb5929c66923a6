"""enf-pde-tpu: TPU-native equivariant neural fields for space-time continuous PDE forecasting.

A ground-up JAX/XLA/Pallas/pjit framework with the capabilities of the reference
``david-knigge/enf-pde`` ("Space-Time Continuous PDE Forecasting using Equivariant
Neural Fields", arXiv 2406.06660):

- PDE solution frames on planar / toroidal / spherical / ball geometries are compressed
  into small sets of latent point poses + context vectors via a bi-invariant equivariant
  cross-attention decoder (``models.decoder.EnfDecoder``).
- Per-frame latents are obtained by a meta-learned few-step SGD inner loop
  (``train.inner_loop``, a ``lax.scan``) or per-sample autodecoding.
- Forecasting runs entirely in latent space by integrating a learned equivariant
  (PONITA-style) neural ODE (``dynamics``), then decoding anywhere in space-time.

TPU-first design choices (vs the reference's single-device, Python-loop-unrolled JAX):

- ``lax.scan`` for the meta-SGD inner loop, the ODE rollout, and chunked decoding —
  bounded compile time and memory, remat-friendly BPTT.
- Explicit PRNG key threading (the reference reuses keys across subsampling masks).
- A fused Pallas decode kernel (``ops.pallas_decode``) tiled over the coordinate axis
  that never materializes the FiLM-conditioned ``[batch, coords, latents, heads, dim]``
  value tensor.
- A sharding layer (``parallel``) over ``jax.sharding.Mesh`` — data-parallel training
  over the batch axis and coordinate-sharded full-field decode for super-resolution.
- JAX-native data generation (``data``) — the Navier-Stokes pseudo-spectral solver and
  friends run jitted on the accelerator instead of host-side torch/py-pde.
"""

__version__ = "0.1.0"
