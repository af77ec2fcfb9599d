"""INT8 dynamic quantization for Dense kernels (inference path).

Parity target: step9_quantize_dit_xl.py:238-280 (torch.quantization
dynamic INT8 of Linear layers, fbgemm). TPU-native equivalent: per-channel
symmetric int8 weights with fp activations, computed via int8 lax.dot_general
where profitable (AQT-style) or dequant-matmul otherwise.

API mirrors the LoRA tree pattern: ``quantize_params`` walks a param tree
and replaces targeted Dense kernels with {values: int8, scales: f32};
``dequantize_params`` reconstructs fp params for a drop-in forward.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("qkv", "proj", "w12", "w3", "fc1", "fc2", "adaLN", "linear")


def quantize_kernel(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8: w ≈ values · scales."""
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # (..., 1, out)
    scales = jnp.maximum(absmax / 127.0, 1e-12)
    values = jnp.clip(jnp.round(w / scales), -127, 127).astype(jnp.int8)
    return {"values": values, "scales": scales.astype(jnp.float32)}


def dequantize_kernel(q: Dict[str, jax.Array], dtype=jnp.float32) -> jax.Array:
    return (q["values"].astype(jnp.float32) * q["scales"]).astype(dtype)


def int8_matmul(x: jax.Array, q: Dict[str, jax.Array]) -> jax.Array:
    """x @ W with int8 weights: quantize activations per-row, int8×int8 MXU
    dot, rescale. Falls back to dequant matmul for tiny shapes."""
    x_absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_absmax / 127.0, 1e-12)
    x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        q["values"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * x_scale * q["scales"].reshape(1, -1)


def quantize_params(
    params: Any, targets: Sequence[str] = DEFAULT_TARGETS
) -> Tuple[Any, Dict]:
    """Returns (params_with_int8_leaves, layout) — layout marks which kernels
    were quantized so ``dequantize_params`` can restore them."""
    layout: Dict = {}

    def walk(node, lpath):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k == "kernel"
                    and not isinstance(v, dict)
                    and lpath
                    and lpath[-1] in targets
                    and v.ndim >= 2
                ):
                    out[k] = quantize_kernel(v)
                    n = layout
                    for p in lpath:
                        n = n.setdefault(p, {})
                    n["kernel"] = True
                else:
                    out[k] = walk(v, lpath + (k,))
            return out
        return node

    return walk(params, ()), layout


def dequantize_params(qparams: Any, dtype=jnp.float32) -> Any:
    def walk(node):
        if isinstance(node, dict):
            if "values" in node and "scales" in node:
                return dequantize_kernel(node, dtype)
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(qparams)


def quantized_size_bytes(params: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    )


def benchmark_quantization(
    apply_fn,
    params: Any,
    example_inputs: tuple,
    targets: Sequence[str] = DEFAULT_TARGETS,
    reps: int = 10,
) -> Dict:
    """Size / latency / quality harness (step9_quantize_dit_xl.py:281-466).

    ``apply_fn(params, *inputs)`` is the model forward. Quantizes the target
    Dense kernels, measures model size, per-call latency (full value fetch —
    async backends under-report otherwise), and output deviation vs fp.
    """
    import time

    import numpy as np

    qparams, _ = quantize_params(params, targets)
    deq = dequantize_params(qparams)

    def timed(p):
        fn = jax.jit(apply_fn)
        out = np.asarray(fn(p, *example_inputs))  # compile + fetch
        t0 = time.perf_counter()
        for _ in range(reps):
            out = np.asarray(fn(p, *example_inputs))
        return (time.perf_counter() - t0) / reps, out

    fp_time, fp_out = timed(params)
    # dequant path: weights stored int8, dequantized for the fp matmul —
    # measures the quantization QUALITY cost; storage wins are in *_size_mb.
    # (True int8 compute goes through int8_matmul for serving-critical layers.)
    q_time, q_out = timed(deq)
    denom = float(np.abs(fp_out.astype(np.float32)).mean()) or 1.0
    return {
        "fp_size_mb": quantized_size_bytes(params) / 2**20,
        "int8_size_mb": quantized_size_bytes(qparams) / 2**20,
        "compression": quantized_size_bytes(params) / max(quantized_size_bytes(qparams), 1),
        "fp_latency_ms": fp_time * 1e3,
        "dequant_latency_ms": q_time * 1e3,
        "mean_abs_rel_error": float(
            np.abs(fp_out.astype(np.float32) - q_out.astype(np.float32)).mean()
        ) / denom,
    }
