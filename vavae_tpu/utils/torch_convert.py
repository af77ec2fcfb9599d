"""PyTorch state-dict → JAX param-tree converters.

Handles the reference checkpoints (VA-VAE .ckpt / LightningDiT .pt) so users
can bring their trained weights to this framework. Layout rules:

  - Conv2d  (O, I, kh, kw)  → flax Conv kernel (kh, kw, I, O)
  - Linear  (O, I)          → flax Dense kernel (I, O)
  - GroupNorm/LayerNorm weight/bias → scale/bias
  - PatchEmbed conv (D, C, p, p) → Dense kernel (p·p·C, D) with (kh, kw, C)
    flattening order (matches models/dit.py PatchEmbed's reshape order)
  - DiT blocks are stacked along a leading depth axis when the model uses
    ``scan_blocks=True`` (the default).

All inputs are numpy arrays (load with train/checkpoint.py helpers).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv(sd: Mapping, prefix: str) -> Dict:
    return {
        "kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0)),
        "bias": sd[f"{prefix}.bias"],
    }


def _dense(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": np.transpose(sd[f"{prefix}.weight"], (1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd: Mapping, prefix: str) -> Dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _groupnorm(sd: Mapping, prefix: str) -> Dict:
    # our GroupNorm32 wraps nn.GroupNorm under the child name "norm"
    return {"norm": _norm(sd, prefix)}


# -- VAE ----------------------------------------------------------------------


def _resnet_block(sd: Mapping, p: str, has_shortcut: bool) -> Dict:
    out = {
        "norm1": _groupnorm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _groupnorm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if has_shortcut:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    return out


def _attn_block(sd: Mapping, p: str) -> Dict:
    return {
        "norm": _groupnorm(sd, f"{p}.norm"),
        "q": _conv(sd, f"{p}.q"),
        "k": _conv(sd, f"{p}.k"),
        "v": _conv(sd, f"{p}.v"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def vae_params_from_torch(
    sd: Mapping[str, np.ndarray],
    ch: int = 128,
    ch_mult=(1, 1, 2, 2, 4),
    num_res_blocks: int = 2,
    attn_resolutions=(16,),
    dec_attn_resolutions=(16,),
    resolution: int = 256,
) -> Dict:
    """Convert a reference AutoencoderKL state dict (tokenizer/autoencoder.py
    naming: encoder.down.{i}.block.{j}..., decoder.up.{i}...) to our tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    n_levels = len(ch_mult)

    enc: Dict = {"conv_in": _conv(sd, "encoder.conv_in")}
    curr_res = resolution
    in_mult = (1,) + tuple(ch_mult)
    for i in range(n_levels):
        block_in = ch * in_mult[i]
        block_out = ch * ch_mult[i]
        for j in range(num_res_blocks):
            has_sc = (block_in if j == 0 else block_out) != block_out
            enc[f"down_{i}_block_{j}"] = _resnet_block(
                sd, f"encoder.down.{i}.block.{j}", has_sc
            )
            if curr_res in attn_resolutions:
                enc[f"down_{i}_attn_{j}"] = _attn_block(sd, f"encoder.down.{i}.attn.{j}")
        if i != n_levels - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down.{i}.downsample.conv")
            }
            curr_res //= 2
    enc["mid_block_1"] = _resnet_block(sd, "encoder.mid.block_1", False)
    enc["mid_attn_1"] = _attn_block(sd, "encoder.mid.attn_1")
    enc["mid_block_2"] = _resnet_block(sd, "encoder.mid.block_2", False)
    enc["norm_out"] = _groupnorm(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Dict = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_block_1"] = _resnet_block(sd, "decoder.mid.block_1", False)
    dec["mid_attn_1"] = _attn_block(sd, "decoder.mid.attn_1")
    dec["mid_block_2"] = _resnet_block(sd, "decoder.mid.block_2", False)
    curr_res = resolution // 2 ** (n_levels - 1)
    block_in = ch * ch_mult[-1]
    for i in reversed(range(n_levels)):
        block_out = ch * ch_mult[i]
        for j in range(num_res_blocks + 1):
            has_sc = (block_in if j == 0 else block_out) != block_out
            dec[f"up_{i}_block_{j}"] = _resnet_block(sd, f"decoder.up.{i}.block.{j}", has_sc)
            if curr_res in dec_attn_resolutions:
                dec[f"up_{i}_attn_{j}"] = _attn_block(sd, f"decoder.up.{i}.attn.{j}")
        block_in = block_out
        if i != 0:
            dec[f"up_{i}_upsample"] = {"conv": _conv(sd, f"decoder.up.{i}.upsample.conv")}
            curr_res *= 2
    dec["norm_out"] = _groupnorm(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


# -- DiT ------------------------------------------------------------------------


def _rope_permute_qkv(dense: Dict, num_heads: int) -> Dict:
    """Permute q,k output columns into the split-half RoPE layout
    (posembed.rope_permutation). q·kᵀ is invariant to a shared permutation
    of q and k, so converted models stay bit-identical to the reference."""
    from vavae_tpu.models.posembed import rope_permutation

    kernel = dense["kernel"]  # (in, 3*dim)
    d_in, three_dim = kernel.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    perm = rope_permutation(head_dim)

    def permute(x, axis):
        shape = x.shape
        x = x.reshape(shape[:axis] + (3, num_heads, head_dim))
        x = np.concatenate(
            [np.take(x[..., :2, :, :], perm, axis=-1), x[..., 2:, :, :]], axis=-3
        )
        return x.reshape(shape)

    out = {"kernel": permute(kernel, 1)}
    if "bias" in dense:
        out["bias"] = permute(dense["bias"], 0)
    return out


def _dit_block_from_torch(
    sd: Mapping, p: str, use_swiglu: bool, use_rmsnorm: bool,
    rope_heads: int = 0,
) -> Dict:
    qkv = _dense(sd, f"{p}.attn.qkv")
    if rope_heads:
        qkv = _rope_permute_qkv(qkv, rope_heads)
    out: Dict = {
        "adaLN": _dense(sd, f"{p}.adaLN_modulation.1"),
        "attn": {
            "qkv": qkv,
            "proj": _dense(sd, f"{p}.attn.proj"),
        },
    }
    if f"{p}.attn.q_norm.weight" in sd:
        from vavae_tpu.models.posembed import rope_permutation

        def qknorm(name):
            w = {"weight": sd[f"{p}.attn.{name}.weight"]} if use_rmsnorm else _norm(
                sd, f"{p}.attn.{name}"
            )
            if rope_heads:
                # qk-norm weights live on the head dim — permute with q,k
                head_dim = w["weight"].shape[-1] if use_rmsnorm else w["scale"].shape[-1]
                perm = rope_permutation(head_dim)
                w = {k: np.take(v, perm, axis=-1) for k, v in w.items()}
            return w

        out["attn"]["q_norm"] = qknorm("q_norm")
        out["attn"]["k_norm"] = qknorm("k_norm")
    if use_rmsnorm:
        out["norm1"] = {"weight": sd[f"{p}.norm1.weight"]}
        out["norm2"] = {"weight": sd[f"{p}.norm2.weight"]}
    if use_swiglu:
        out["mlp"] = {"w12": _dense(sd, f"{p}.mlp.w12"), "w3": _dense(sd, f"{p}.mlp.w3")}
    else:
        out["mlp"] = {"fc1": _dense(sd, f"{p}.mlp.fc1"), "fc2": _dense(sd, f"{p}.mlp.fc2")}
    return out


def dit_params_from_torch(
    sd: Mapping[str, np.ndarray],
    depth: int,
    use_swiglu: bool = True,
    use_rmsnorm: bool = True,
    scan_blocks: bool = True,
    rope_heads: int = 0,
) -> Dict:
    """Convert a reference LightningDiT state dict to our param tree.

    ``rope_heads``: when the model uses RoPE, pass num_heads so q,k columns
    are permuted into our split-half rotary layout (attention outputs remain
    bit-identical; see posembed.rope_2d_freqs)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    w = sd["x_embedder.proj.weight"]  # (D, C, p, p)
    d_out, c_in, p1, p2 = w.shape
    x_emb = {
        "proj": {
            "kernel": np.transpose(w, (2, 3, 1, 0)).reshape(p1 * p2 * c_in, d_out),
            "bias": sd["x_embedder.proj.bias"],
        }
    }

    t_emb = {"fc1": _dense(sd, "t_embedder.mlp.0"), "fc2": _dense(sd, "t_embedder.mlp.2")}
    y_emb = {"table": {"embedding": sd["y_embedder.embedding_table.weight"]}}

    blocks = [
        _dit_block_from_torch(sd, f"blocks.{i}", use_swiglu, use_rmsnorm, rope_heads)
        for i in range(depth)
    ]
    if scan_blocks:
        import jax

        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *blocks)
        block_tree = {"blocks": {"block": stacked}}
    else:
        block_tree = {f"block_{i}": b for i, b in enumerate(blocks)}

    final: Dict = {
        "adaLN": _dense(sd, "final_layer.adaLN_modulation.1"),
        "linear": _dense(sd, "final_layer.linear"),
    }
    if use_rmsnorm and "final_layer.norm_final.weight" in sd:
        final["norm_final"] = {"weight": sd["final_layer.norm_final.weight"]}

    return {
        "x_embedder": x_emb,
        "t_embedder": t_emb,
        "y_embedder": y_emb,
        **block_tree,
        "final_layer": final,
    }
