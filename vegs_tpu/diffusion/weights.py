"""Stable-Diffusion checkpoint (PyTorch/diffusers layout) -> Flax parameters.

Maps the diffusers `unet/diffusion_pytorch_model.*` and
`vae/diffusion_pytorch_model.*` state dicts onto vegs_tpu.diffusion modules.
Runs fully offline against a local checkpoint directory (HF hub layout); no
network access. LoRA attention weights saved by the trainer
(vegs_tpu.diffusion.lora_train / the reference's save_attn_procs) merge into
the `lora_down`/`lora_up` leaves.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax.numpy as jnp
import numpy as np


def _load_state_dict(model_dir: str) -> dict:
    """Load safetensors or torch .bin from a diffusers model dir as numpy."""
    st_path = os.path.join(model_dir, "diffusion_pytorch_model.safetensors")
    bin_path = os.path.join(model_dir, "diffusion_pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    import torch

    state = torch.load(bin_path, map_location="cpu")
    return {k: v.numpy() for k, v in state.items()}


def _conv(w):  # OIHW -> HWIO
    return jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))


def _lin(w):  # [O, I] -> [I, O]
    return jnp.asarray(np.asarray(w).T)


def _arr(w):
    return jnp.asarray(np.asarray(w))


class _P(dict):
    """Nested param dict with path-based set."""

    def set(self, path: str, value):
        node = self
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value


def convert_unet_state(state: dict, cfg) -> dict:
    """diffusers UNet2DConditionModel state_dict -> UNet2DCondition params."""
    p = _P()
    g = lambda k: state[k]

    p.set("time_dense1/kernel", _lin(g("time_embedding.linear_1.weight")))
    p.set("time_dense1/bias", _arr(g("time_embedding.linear_1.bias")))
    p.set("time_dense2/kernel", _lin(g("time_embedding.linear_2.weight")))
    p.set("time_dense2/bias", _arr(g("time_embedding.linear_2.bias")))
    p.set("conv_in/kernel", _conv(g("conv_in.weight")))
    p.set("conv_in/bias", _arr(g("conv_in.bias")))
    p.set("norm_out/scale", _arr(g("conv_norm_out.weight")))
    p.set("norm_out/bias", _arr(g("conv_norm_out.bias")))
    p.set("conv_out/kernel", _conv(g("conv_out.weight")))
    p.set("conv_out/bias", _arr(g("conv_out.bias")))

    def resnet(dst, src):
        p.set(f"{dst}/norm1/scale", _arr(g(f"{src}.norm1.weight")))
        p.set(f"{dst}/norm1/bias", _arr(g(f"{src}.norm1.bias")))
        p.set(f"{dst}/conv1/kernel", _conv(g(f"{src}.conv1.weight")))
        p.set(f"{dst}/conv1/bias", _arr(g(f"{src}.conv1.bias")))
        p.set(f"{dst}/time_emb_proj/kernel", _lin(g(f"{src}.time_emb_proj.weight")))
        p.set(f"{dst}/time_emb_proj/bias", _arr(g(f"{src}.time_emb_proj.bias")))
        p.set(f"{dst}/norm2/scale", _arr(g(f"{src}.norm2.weight")))
        p.set(f"{dst}/norm2/bias", _arr(g(f"{src}.norm2.bias")))
        p.set(f"{dst}/conv2/kernel", _conv(g(f"{src}.conv2.weight")))
        p.set(f"{dst}/conv2/bias", _arr(g(f"{src}.conv2.bias")))
        if f"{src}.conv_shortcut.weight" in state:
            p.set(f"{dst}/shortcut/kernel", _conv(g(f"{src}.conv_shortcut.weight")))
            p.set(f"{dst}/shortcut/bias", _arr(g(f"{src}.conv_shortcut.bias")))

    def attn_proj(dst, src, has_bias):
        p.set(f"{dst}/base/kernel", _lin(g(f"{src}.weight")))
        if has_bias:
            p.set(f"{dst}/base/bias", _arr(g(f"{src}.bias")))

    def transformer(dst, src):
        p.set(f"{dst}/norm/scale", _arr(g(f"{src}.norm.weight")))
        p.set(f"{dst}/norm/bias", _arr(g(f"{src}.norm.bias")))
        p.set(f"{dst}/proj_in/kernel", _lin(g(f"{src}.proj_in.weight")))
        p.set(f"{dst}/proj_in/bias", _arr(g(f"{src}.proj_in.bias")))
        p.set(f"{dst}/proj_out/kernel", _lin(g(f"{src}.proj_out.weight")))
        p.set(f"{dst}/proj_out/bias", _arr(g(f"{src}.proj_out.bias")))
        blk_src = f"{src}.transformer_blocks.0"
        blk = f"{dst}/block"
        for i, attn in ((1, "attn1"), (2, "attn2")):
            attn_proj(f"{blk}/{attn}/to_q", f"{blk_src}.{attn}.to_q", False)
            attn_proj(f"{blk}/{attn}/to_k", f"{blk_src}.{attn}.to_k", False)
            attn_proj(f"{blk}/{attn}/to_v", f"{blk_src}.{attn}.to_v", False)
            attn_proj(f"{blk}/{attn}/to_out", f"{blk_src}.{attn}.to_out.0", True)
            p.set(f"{blk}/norm{i}/scale", _arr(g(f"{blk_src}.norm{i}.weight")))
            p.set(f"{blk}/norm{i}/bias", _arr(g(f"{blk_src}.norm{i}.bias")))
        p.set(f"{blk}/norm3/scale", _arr(g(f"{blk_src}.norm3.weight")))
        p.set(f"{blk}/norm3/bias", _arr(g(f"{blk_src}.norm3.bias")))
        p.set(f"{blk}/ff_geglu/proj/kernel", _lin(g(f"{blk_src}.ff.net.0.proj.weight")))
        p.set(f"{blk}/ff_geglu/proj/bias", _arr(g(f"{blk_src}.ff.net.0.proj.bias")))
        p.set(f"{blk}/ff_out/kernel", _lin(g(f"{blk_src}.ff.net.2.weight")))
        p.set(f"{blk}/ff_out/bias", _arr(g(f"{blk_src}.ff.net.2.bias")))

    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            resnet(f"down_{i}_res{j}", f"down_blocks.{i}.resnets.{j}")
            if cfg.with_attention[i]:
                transformer(f"down_{i}_attn{j}", f"down_blocks.{i}.attentions.{j}")
        if i < n_blocks - 1:
            p.set(f"down_{i}_downsample/kernel",
                  _conv(g(f"down_blocks.{i}.downsamplers.0.conv.weight")))
            p.set(f"down_{i}_downsample/bias",
                  _arr(g(f"down_blocks.{i}.downsamplers.0.conv.bias")))

    resnet("mid_res0", "mid_block.resnets.0")
    resnet("mid_res1", "mid_block.resnets.1")
    transformer("mid_attn", "mid_block.attentions.0")

    for i in reversed(range(n_blocks)):
        ui = n_blocks - 1 - i  # diffusers up_blocks index
        for j in range(cfg.layers_per_block + 1):
            resnet(f"up_{i}_res{j}", f"up_blocks.{ui}.resnets.{j}")
            if cfg.with_attention[i]:
                transformer(f"up_{i}_attn{j}", f"up_blocks.{ui}.attentions.{j}")
        if i > 0:
            p.set(f"up_{i}_upsample/kernel",
                  _conv(g(f"up_blocks.{ui}.upsamplers.0.conv.weight")))
            p.set(f"up_{i}_upsample/bias",
                  _arr(g(f"up_blocks.{ui}.upsamplers.0.conv.bias")))
    return {"params": dict(p)}


def convert_vae_state(state: dict, cfg) -> dict:
    """diffusers AutoencoderKL state_dict -> AutoencoderKL params."""
    p = _P()
    g = lambda k: state[k]

    def vresnet(dst, src):
        p.set(f"{dst}/norm1/scale", _arr(g(f"{src}.norm1.weight")))
        p.set(f"{dst}/norm1/bias", _arr(g(f"{src}.norm1.bias")))
        p.set(f"{dst}/conv1/kernel", _conv(g(f"{src}.conv1.weight")))
        p.set(f"{dst}/conv1/bias", _arr(g(f"{src}.conv1.bias")))
        p.set(f"{dst}/norm2/scale", _arr(g(f"{src}.norm2.weight")))
        p.set(f"{dst}/norm2/bias", _arr(g(f"{src}.norm2.bias")))
        p.set(f"{dst}/conv2/kernel", _conv(g(f"{src}.conv2.weight")))
        p.set(f"{dst}/conv2/bias", _arr(g(f"{src}.conv2.bias")))
        if f"{src}.conv_shortcut.weight" in state:
            p.set(f"{dst}/shortcut/kernel", _conv(g(f"{src}.conv_shortcut.weight")))
            p.set(f"{dst}/shortcut/bias", _arr(g(f"{src}.conv_shortcut.bias")))

    def vattn(dst, src):
        p.set(f"{dst}/norm/scale", _arr(g(f"{src}.group_norm.weight")))
        p.set(f"{dst}/norm/bias", _arr(g(f"{src}.group_norm.bias")))
        for a, b in (("q", "to_q"), ("k", "to_k"), ("v", "to_v"),
                     ("proj_out", "to_out.0")):
            p.set(f"{dst}/{a}/kernel", _lin(g(f"{src}.{b}.weight")))
            p.set(f"{dst}/{a}/bias", _arr(g(f"{src}.{b}.bias")))

    n = len(cfg.block_out_channels)
    for half, prefix in (("encoder", "encoder"), ("decoder", "decoder")):
        p.set(f"{half}/conv_in/kernel", _conv(g(f"{prefix}.conv_in.weight")))
        p.set(f"{half}/conv_in/bias", _arr(g(f"{prefix}.conv_in.bias")))
        p.set(f"{half}/norm_out/scale", _arr(g(f"{prefix}.conv_norm_out.weight")))
        p.set(f"{half}/norm_out/bias", _arr(g(f"{prefix}.conv_norm_out.bias")))
        p.set(f"{half}/conv_out/kernel", _conv(g(f"{prefix}.conv_out.weight")))
        p.set(f"{half}/conv_out/bias", _arr(g(f"{prefix}.conv_out.bias")))
        vresnet(f"{half}/mid_res0", f"{prefix}.mid_block.resnets.0")
        vresnet(f"{half}/mid_res1", f"{prefix}.mid_block.resnets.1")
        vattn(f"{half}/mid_attn", f"{prefix}.mid_block.attentions.0")

    for i in range(n):
        for j in range(cfg.layers_per_block):
            vresnet(f"encoder/down_{i}_res{j}", f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            p.set(f"encoder/down_{i}_downsample/kernel",
                  _conv(g(f"encoder.down_blocks.{i}.downsamplers.0.conv.weight")))
            p.set(f"encoder/down_{i}_downsample/bias",
                  _arr(g(f"encoder.down_blocks.{i}.downsamplers.0.conv.bias")))
    for i in reversed(range(n)):
        ui = n - 1 - i
        for j in range(cfg.layers_per_block + 1):
            vresnet(f"decoder/up_{i}_res{j}", f"decoder.up_blocks.{ui}.resnets.{j}")
        if i > 0:
            p.set(f"decoder/up_{i}_upsample/kernel",
                  _conv(g(f"decoder.up_blocks.{ui}.upsamplers.0.conv.weight")))
            p.set(f"decoder/up_{i}_upsample/bias",
                  _arr(g(f"decoder.up_blocks.{ui}.upsamplers.0.conv.bias")))

    p.set("quant_conv/kernel", _conv(g("quant_conv.weight")))
    p.set("quant_conv/bias", _arr(g("quant_conv.bias")))
    p.set("post_quant_conv/kernel", _conv(g("post_quant_conv.weight")))
    p.set("post_quant_conv/bias", _arr(g("post_quant_conv.bias")))
    return {"params": dict(p)}


def load_sd_checkpoint(checkpoint_dir: str, prompt: str,
                       negative_prompt: str = "",
                       lora_dir: Optional[str] = None,
                       lora_rank: int = 4):
    """Assemble DiffusionModels from a local diffusers checkpoint tree."""
    from .lora import load_lora_weights
    from .pipeline import DiffusionModels, encode_text_embeddings
    from .scheduler import DiffusionSchedule
    from .unet import UNet2DCondition, UNetConfig, init_unet
    from .vae import AutoencoderKL, VAEConfig, init_vae
    import jax

    ucfg = UNetConfig.sd21() if lora_dir is None else (
        UNetConfig(**{**UNetConfig.sd21().__dict__, "lora_rank": lora_rank}))
    vcfg = VAEConfig.sd()

    unet_params = convert_unet_state(
        _load_state_dict(os.path.join(checkpoint_dir, "unet")), ucfg)
    vae_params = convert_vae_state(
        _load_state_dict(os.path.join(checkpoint_dir, "vae")), vcfg)

    if lora_dir is not None:
        # Initialize LoRA leaves (zeros for up, random down) then overwrite
        # from the trained weights; the sentinel "init" keeps the fresh
        # leaves (used by the per-segment LoRA trainer, tools/lora_train.py).
        init = init_unet(jax.random.key(0), ucfg, image_size=8)
        unet_params = _merge_missing(unet_params, init)
        if lora_dir != "init":
            unet_params = load_lora_weights(unet_params, lora_dir)

    return DiffusionModels(
        unet=UNet2DCondition(ucfg),
        unet_params=unet_params,
        vae=AutoencoderKL(vcfg),
        vae_params=vae_params,
        schedule=DiffusionSchedule.scaled_linear(),
        text_embeddings=encode_text_embeddings(
            checkpoint_dir, prompt, negative_prompt),
    )


def _merge_missing(dst: dict, src: dict) -> dict:
    """Recursively add leaves present in src but absent in dst."""
    out = dict(dst)
    for k, v in src.items():
        if k not in out:
            out[k] = v
        elif isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = _merge_missing(out[k], v)
    return out
