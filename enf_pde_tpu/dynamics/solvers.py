"""Fixed-step latent ODE solvers compiled with ``lax.scan``.

The reference unrolls Python loops with ``xs.at[i].set`` under jit
(``trainer_utils/solvers.py:108-162``), which bloats compile time and memory for long
horizons. Here rollouts are a single ``lax.scan`` step function, optionally wrapped in
``jax.checkpoint`` so BPTT through long out-horizons (50 for Navier-Stokes) stores one
residual set per step instead of the whole unrolled graph.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["euler_step", "rk4_step", "solve_latent_ode", "solve_ode"]

PyTree = Any
VectorField = Callable[[PyTree, jnp.ndarray], PyTree]


def _axpy(x: PyTree, d: PyTree, h) -> PyTree:
    return jax.tree.map(lambda xi, di: xi + h * di, x, d)


def euler_step(f: VectorField, x: PyTree, t, h) -> PyTree:
    return _axpy(x, f(x, t), h)


def rk4_step(f: VectorField, x: PyTree, t, h) -> PyTree:
    k1 = f(x, t)
    k2 = f(_axpy(x, k1, 0.5 * h), t + 0.5 * h)
    k3 = f(_axpy(x, k2, 0.5 * h), t + 0.5 * h)
    k4 = f(_axpy(x, k3, h), t + h)
    return jax.tree.map(
        lambda xi, a, b, c, d: xi + (h / 6.0) * (a + 2 * b + 2 * c + d), x, k1, k2, k3, k4
    )


_STEPPERS = {"euler": euler_step, "rk4": rk4_step}


def solve_latent_ode(
    f: VectorField,
    latents: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    t0: float,
    tf: float,
    h: float,
    method: str = "euler",
    stop_gradient: bool = False,
    remat: bool = True,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Roll a latent set ``(p, a, window)`` forward with a fixed-step integrator.

    Args:
        f: latent vector field, ``f(latents, t) -> d latents``.
        latents: initial ``(p[b,z,*], a[b,z,*], window[b,z,1])``.
        t0 / tf / h: start time, end time, step size; ``num_steps = int((tf-t0)/h)``.
        method: 'euler' | 'rk4'.
        stop_gradient: cut BPTT between steps (per-step gradients only).
        remat: rematerialize each step in the backward pass (memory-bounded BPTT).
        unroll: scan unroll factor. Latent states are tiny (a few KB), so for
            short horizons unrolling trades nothing for cross-step fusion of the
            small PONITA kernels; keep 1 for long-horizon memory-bound BPTT.

    Returns:
        ``(p, a, window)`` trajectories with shape [batch, num_steps + 1, ...].
    """
    if method not in _STEPPERS:
        raise ValueError(f"Unknown method: {method!r}")
    stepper = _STEPPERS[method]
    num_steps = int((tf - t0) / h)

    def step(carry, t):
        x = carry
        if stop_gradient:
            x = jax.tree.map(jax.lax.stop_gradient, x)
        x_next = stepper(f, x, t, h)
        return x_next, x_next

    if remat:
        step = jax.checkpoint(step)

    ts = t0 + h * jnp.arange(num_steps)
    _, traj = jax.lax.scan(step, latents, ts, unroll=unroll)
    # Prepend the initial state and put batch in front: [time, b, ...] -> [b, time, ...].
    full = jax.tree.map(
        lambda x0, tr: jnp.concatenate([x0[None], tr], axis=0), latents, traj
    )
    return jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), full)


def solve_ode(f: VectorField, x0: jnp.ndarray, t0: float, tf: float, h: float, method: str = "rk4"):
    """Generic array-state ODE rollout (scan). Returns [num_steps + 1, *x0.shape]."""
    stepper = _STEPPERS[method]
    num_steps = int((tf - t0) / h)

    def step(x, t):
        x_next = stepper(f, x, t, h)
        return x_next, x_next

    ts = t0 + h * jnp.arange(num_steps)
    _, traj = jax.lax.scan(step, x0, ts)
    return jnp.concatenate([x0[None], traj], axis=0)
