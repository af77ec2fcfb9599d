"""JAX param-tree → PyTorch state-dict exporters.

Exact inverses of `utils/torch_convert.py`, so checkpoints trained in this
framework can go BACK to the reference code (autoencoder.py / lightningdit.py
module naming) — the migration path works in both directions. Layout rules
(mirrors of torch_convert's docstring):

  - flax Conv kernel (kh, kw, I, O) → Conv2d (O, I, kh, kw)
  - flax Dense kernel (I, O)        → Linear (O, I)
  - scale/bias                      → GroupNorm/LayerNorm weight/bias
  - PatchEmbed Dense (p·p·C, D)     → conv (D, C, p, p)
  - scan-stacked DiT blocks unstack along the leading depth axis
  - split-half RoPE q,k columns permute back to the reference's interleaved
    layout (inverse of posembed.rope_permutation)

Every exporter returns plain ``{torch_name: np.ndarray}`` — save with
``torch.save({"state_dict"/"model"/"ema": ...})`` or safetensors as needed.
Roundtrip identity + strict-load forward parity are tested in
tests/test_torch_export.py.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32) if getattr(x, "dtype", None) and \
        str(x.dtype) == "bfloat16" else np.asarray(x)


def _conv_out(sd: Dict, tree: Mapping, prefix: str) -> None:
    sd[f"{prefix}.weight"] = np.transpose(_np(tree["kernel"]), (3, 2, 0, 1))
    sd[f"{prefix}.bias"] = _np(tree["bias"])


def _dense_out(sd: Dict, tree: Mapping, prefix: str) -> None:
    sd[f"{prefix}.weight"] = np.transpose(_np(tree["kernel"]), (1, 0))
    if "bias" in tree:
        sd[f"{prefix}.bias"] = _np(tree["bias"])


def _norm_out(sd: Dict, tree: Mapping, prefix: str) -> None:
    sd[f"{prefix}.weight"] = _np(tree["scale"])
    sd[f"{prefix}.bias"] = _np(tree["bias"])


def _groupnorm_out(sd: Dict, tree: Mapping, prefix: str) -> None:
    _norm_out(sd, tree["norm"], prefix)  # GroupNorm32 wraps under "norm"


# -- VAE -----------------------------------------------------------------------


def _resnet_block_out(sd: Dict, tree: Mapping, p: str) -> None:
    _groupnorm_out(sd, tree["norm1"], f"{p}.norm1")
    _conv_out(sd, tree["conv1"], f"{p}.conv1")
    _groupnorm_out(sd, tree["norm2"], f"{p}.norm2")
    _conv_out(sd, tree["conv2"], f"{p}.conv2")
    if "nin_shortcut" in tree:
        _conv_out(sd, tree["nin_shortcut"], f"{p}.nin_shortcut")


def _attn_block_out(sd: Dict, tree: Mapping, p: str) -> None:
    _groupnorm_out(sd, tree["norm"], f"{p}.norm")
    for name in ("q", "k", "v", "proj_out"):
        _conv_out(sd, tree[name], f"{p}.{name}")


def vae_params_to_torch(params: Mapping) -> Dict[str, np.ndarray]:
    """Our AutoencoderKL param tree → reference state dict
    (tokenizer/autoencoder.py naming). Inverse of vae_params_from_torch:
    walks OUR key names (down_{i}_block_{j}, up_{i}_upsample, ...) so no
    architecture hyperparameters are needed."""
    sd: Dict[str, np.ndarray] = {}
    for side, ref in (("encoder", "encoder"), ("decoder", "decoder")):
        tree = params[side]
        for key, sub in tree.items():
            if key == "conv_in" or key == "conv_out":
                _conv_out(sd, sub, f"{ref}.{key}")
            elif key == "norm_out":
                _groupnorm_out(sd, sub, f"{ref}.norm_out")
            elif key.startswith("mid_block"):
                _resnet_block_out(sd, sub, f"{ref}.mid.block_{key[-1]}")
            elif key == "mid_attn_1":
                _attn_block_out(sd, sub, f"{ref}.mid.attn_1")
            elif "_block_" in key:  # down_{i}_block_{j} / up_{i}_block_{j}
                kind, i, _, j = key.split("_")
                _resnet_block_out(sd, sub, f"{ref}.{kind}.{i}.block.{j}")
            elif "_attn_" in key:
                kind, i, _, j = key.split("_")
                _attn_block_out(sd, sub, f"{ref}.{kind}.{i}.attn.{j}")
            elif key.endswith("_downsample") or key.endswith("_upsample"):
                kind, i, samp = key.split("_")
                _conv_out(sd, sub["conv"], f"{ref}.{kind}.{i}.{samp}.conv")
            else:  # pragma: no cover - new module in the flax tree
                raise KeyError(f"unknown {side} entry {key!r}")
    _conv_out(sd, params["quant_conv"], "quant_conv")
    _conv_out(sd, params["post_quant_conv"], "post_quant_conv")
    return sd


# -- DiT -----------------------------------------------------------------------


def _rope_unpermute_qkv(dense: Mapping, num_heads: int) -> Dict:
    """Inverse of torch_convert._rope_permute_qkv: q,k output columns go from
    our split-half rotary layout back to the reference's interleaved one."""
    from vavae_tpu.models.posembed import rope_permutation

    kernel = _np(dense["kernel"])  # (in, 3*dim)
    dim = kernel.shape[1] // 3
    head_dim = dim // num_heads
    inv = np.argsort(rope_permutation(head_dim))

    def unpermute(x, axis):
        shape = x.shape
        x = x.reshape(shape[:axis] + (3, num_heads, head_dim))
        x = np.concatenate(
            [np.take(x[..., :2, :, :], inv, axis=-1), x[..., 2:, :, :]], axis=-3
        )
        return x.reshape(shape)

    out = {"kernel": unpermute(kernel, 1)}
    if "bias" in dense:
        out["bias"] = unpermute(_np(dense["bias"]), 0)
    return out


def _dit_block_to_torch(
    sd: Dict, tree: Mapping, p: str, rope_heads: int = 0
) -> None:
    from vavae_tpu.models.posembed import rope_permutation

    qkv = tree["attn"]["qkv"]
    if rope_heads:
        qkv = _rope_unpermute_qkv(qkv, rope_heads)
    _dense_out(sd, qkv, f"{p}.attn.qkv")
    _dense_out(sd, tree["attn"]["proj"], f"{p}.attn.proj")
    _dense_out(sd, tree["adaLN"], f"{p}.adaLN_modulation.1")
    for name in ("q_norm", "k_norm"):
        if name in tree["attn"]:
            w = {k: _np(v) for k, v in tree["attn"][name].items()}
            if rope_heads:
                head_dim = next(iter(w.values())).shape[-1]
                inv = np.argsort(rope_permutation(head_dim))
                w = {k: np.take(v, inv, axis=-1) for k, v in w.items()}
            if "weight" in w:  # RMSNorm
                sd[f"{p}.attn.{name}.weight"] = w["weight"]
            else:  # LayerNorm scale/bias
                sd[f"{p}.attn.{name}.weight"] = w["scale"]
                sd[f"{p}.attn.{name}.bias"] = w["bias"]
    for name in ("norm1", "norm2"):
        if name in tree:  # RMSNorm weights (LayerNorm variant has no affine)
            sd[f"{p}.{name}.weight"] = _np(tree[name]["weight"])
    mlp = tree["mlp"]
    if "w12" in mlp:  # SwiGLU
        _dense_out(sd, mlp["w12"], f"{p}.mlp.w12")
        _dense_out(sd, mlp["w3"], f"{p}.mlp.w3")
    else:
        _dense_out(sd, mlp["fc1"], f"{p}.mlp.fc1")
        _dense_out(sd, mlp["fc2"], f"{p}.mlp.fc2")


def dit_params_to_torch(
    params: Mapping,
    patch_size: int,
    rope_heads: int = 0,
    input_size: int = 0,
) -> Dict[str, np.ndarray]:
    """Our LightningDiT param tree → reference state dict
    (models/lightningdit.py naming). Inverse of dit_params_from_torch.

    ``patch_size`` disentangles the PatchEmbed Dense kernel's fused
    (p·p·C) input axis; ``rope_heads`` = num_heads when the model uses
    RoPE (undoes the split-half column permutation — attention outputs
    stay bit-identical). With ``input_size`` the frozen sincos
    ``pos_embed`` parameter is synthesized (lightningdit.py:314,349-351 —
    a requires_grad=False table the reference always adds; our model
    computes it on the fly, so it's not in the param tree)."""
    sd: Dict[str, np.ndarray] = {}

    k = _np(params["x_embedder"]["proj"]["kernel"])  # (p*p*C, D)
    d_out = k.shape[1]
    c_in = k.shape[0] // (patch_size * patch_size)
    sd["x_embedder.proj.weight"] = np.transpose(
        k.reshape(patch_size, patch_size, c_in, d_out), (3, 2, 0, 1)
    )
    sd["x_embedder.proj.bias"] = _np(params["x_embedder"]["proj"]["bias"])
    if input_size:
        from vavae_tpu.models.posembed import get_2d_sincos_pos_embed

        grid = input_size // patch_size
        sd["pos_embed"] = get_2d_sincos_pos_embed(d_out, grid).astype(
            np.float32
        )[None]

    _dense_out(sd, params["t_embedder"]["fc1"], "t_embedder.mlp.0")
    _dense_out(sd, params["t_embedder"]["fc2"], "t_embedder.mlp.2")
    sd["y_embedder.embedding_table.weight"] = _np(
        params["y_embedder"]["table"]["embedding"]
    )

    if "blocks" in params:  # nn.scan stack: unstack the leading depth axis
        import jax

        stacked = params["blocks"]["block"]
        depth = len(next(v for v in jax.tree_util.tree_leaves(stacked)))
        for i in range(depth):
            block = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], stacked)
            _dit_block_to_torch(sd, block, f"blocks.{i}", rope_heads)
    else:
        i = 0
        while f"block_{i}" in params:
            _dit_block_to_torch(sd, params[f"block_{i}"], f"blocks.{i}", rope_heads)
            i += 1

    _dense_out(sd, params["final_layer"]["adaLN"], "final_layer.adaLN_modulation.1")
    _dense_out(sd, params["final_layer"]["linear"], "final_layer.linear")
    if "norm_final" in params["final_layer"]:
        sd["final_layer.norm_final.weight"] = _np(
            params["final_layer"]["norm_final"]["weight"]
        )
    return sd
