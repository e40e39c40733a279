"""Functional MLP: init/apply with stacked-ensemble support.

Replaces the reference's scope-variable graph builder
(``training.py:171-214`` build_ff_neural_net): parameters are a plain
pytree ``{"w": [W0..Wn], "b": [b0..bn]}``; the K-member ensemble is the
same pytree with a leading K axis on every leaf, built with
``jax.vmap(init)`` — no named scopes, no variable reuse machinery.

Matmuls hit the MXU; ``preferred_element_type`` keeps accumulation in
fp32 when activations are bf16.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def xavier_uniform(key, shape, dtype=jnp.float32):
    """tf.contrib.layers.xavier_initializer equivalent (uniform)."""
    fan_in, fan_out = shape[0], shape[1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def mlp_init(key, sizes: Sequence[int], dtype=jnp.float32) -> dict:
    """sizes = [n_in, h1, ..., n_out]."""
    n_layers = len(sizes) - 1
    keys = jax.random.split(key, n_layers)
    ws, bs = [], []
    for i in range(n_layers):
        ws.append(xavier_uniform(keys[i], (sizes[i], sizes[i + 1]), dtype))
        bs.append(jnp.zeros((sizes[i + 1],), dtype))
    return {"w": ws, "b": bs}


def mlp_apply(params: dict, x: jnp.ndarray,
              hidden_act: Callable, output_act: Callable = lambda x: x,
              gate: jnp.ndarray | None = None,
              compute_dtype=None) -> jnp.ndarray:
    """Forward pass. ``gate`` multiplies the last hidden activation
    (the reference's sigmoid ``logit_weights`` hook, training.py:212-213).

    ``compute_dtype=bfloat16`` runs the matmuls in bf16 on the MXU with
    fp32 accumulation — params stay fp32 (mixed precision), activations
    are cast per layer."""
    n_layers = len(params["w"])
    h = x if compute_dtype is None else x.astype(compute_dtype)
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        pre = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        h = output_act(pre) if i == n_layers - 1 else hidden_act(pre)
        if gate is not None and i == n_layers - 2:
            h = h * gate
        if compute_dtype is not None and i < n_layers - 1:
            h = h.astype(compute_dtype)
    return h


def mlp_apply_ragged(params: dict, x: jnp.ndarray, group_sizes: jnp.ndarray,
                     member_of_row: jnp.ndarray, hidden_act: Callable,
                     output_act: Callable = lambda x: x,
                     compute_dtype=None) -> jnp.ndarray:
    """Grouped ensemble forward: row i uses member ``member_of_row[i]``'s
    weights. Rows must be pre-sorted by member (``group_sizes[k]``
    consecutive rows for member k). One ``jax.lax.ragged_dot`` (grouped
    matmul, the MoE expert-dispatch primitive) per layer: total MXU work
    is B rows, vs K*B for the all-members-then-select path. Biases are
    per-row gathers (O(B*H) bandwidth, negligible next to the weights).

    ``params`` is the K-stacked pytree from ``ensemble_init`` (leading K
    axis on every leaf)."""
    n_layers = len(params["w"])
    h = x if compute_dtype is None else x.astype(compute_dtype)
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        pre = jax.lax.ragged_dot(h, w, group_sizes,
                                 preferred_element_type=jnp.float32)
        pre = pre + b[member_of_row]
        h = output_act(pre) if i == n_layers - 1 else hidden_act(pre)
        if compute_dtype is not None and i < n_layers - 1:
            h = h.astype(compute_dtype)
    return h


def ensemble_init(key, n_members: int, sizes: Sequence[int], dtype=jnp.float32) -> dict:
    """K independently-initialized member param sets stacked on axis 0."""
    keys = jax.random.split(key, n_members)
    return jax.vmap(lambda k: mlp_init(k, sizes, dtype))(keys)
