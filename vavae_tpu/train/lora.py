"""LoRA adapters over DiT parameter trees.

Parity target: step11_lora_finetune_dit_xl.py:37-105 — rank-r adapters
(A ~ N(0, 0.01²), B = 0, scale α/r) injected by name on the attention qkv /
proj and SwiGLU w12 / w3 projections; LoRA-only checkpoints.

TPU-native design: instead of wrapping modules, LoRA lives as a parallel
pytree over the targeted Dense kernels. ``merge_lora`` produces effective
params (W + scale·A·B) inside jit — the merge is a tiny matmul per layer and
XLA fuses it; training takes grads w.r.t. the LoRA tree only. Works
transparently with the scan-stacked block params (leading depth axis is
just a batch dim on the einsum).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ("qkv", "proj", "w12", "w3")


def _iter_kernels(tree: Any, path: Tuple[str, ...] = ()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_kernels(v, path + (k,))
    else:
        yield path, tree


def _is_target(path: Tuple[str, ...], targets: Sequence[str]) -> bool:
    return len(path) >= 2 and path[-1] == "kernel" and path[-2] in targets


def init_lora(
    rng: jax.Array,
    params: Any,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Dict:
    """Build the LoRA tree: {path: {'a': (..., in, r), 'b': (..., r, out)}}.

    Kernels may carry leading stacked axes (scan-over-depth); A/B get the
    same leading axes so each depth layer has its own adapter.
    """
    lora: Dict = {}
    leaves = [(p, k) for p, k in _iter_kernels(params) if _is_target(p, targets)]
    keys = jax.random.split(rng, max(len(leaves), 1))
    for (path, kernel), key in zip(leaves, keys):
        *lead, d_in, d_out = kernel.shape
        a = 0.01 * jax.random.normal(key, (*lead, d_in, rank), jnp.float32)
        b = jnp.zeros((*lead, rank, d_out), jnp.float32)
        node = lora
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {"a": a, "b": b, "alpha": jnp.asarray(alpha, jnp.float32)}
    return lora


def merge_lora(params: Any, lora: Any, rank: int) -> Any:
    """Effective params: W + (α/r)·A·B on every adapted kernel."""

    def merge(p_node, l_node):
        if isinstance(l_node, dict) and "a" in l_node and "b" in l_node:
            scale = l_node["alpha"] / rank
            delta = jnp.einsum("...ir,...ro->...io", l_node["a"], l_node["b"])
            return p_node + scale * delta.astype(p_node.dtype)
        if isinstance(l_node, dict):
            out = dict(p_node)
            for k, v in l_node.items():
                out[k] = merge(p_node[k], v)
            return out
        return p_node

    return merge(params, lora)


def lora_size(lora: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora))


def save_lora(path: str, lora: Any) -> None:
    """LoRA-only checkpoint (reference step11:745)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(lora)))


def load_lora(path: str, target: Any) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())
