"""Round-trip tests for the real-weight converters.

Each test synthesizes a checkpoint in the GENUINE on-disk layout of the
reference's pretrained priors — diffusers SD UNet/VAE state_dict names
(loss/sd_guidance.py loads stabilityai/stable-diffusion-2-1-base), the
torchvision vgg16 `features.{i}` names (loss/vgg_perceptual_loss.py:6),
and the omnidata DPT-hybrid ckpt names (omnidata/estimate_normal.py:57-67)
— with random tensors, runs it through the converter, asserts the produced
param tree matches the Flax module's init tree EXACTLY (paths and shapes),
and runs one forward pass with the converted weights.

The synthesizers duplicate the checkpoints' channel arithmetic on purpose:
they are an independent model of the real layout, so a converter bug (or a
drift between converter and module) fails the comparison instead of being
absorbed by it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _leaf_shapes(tree, prefix=""):
    """Flatten a nested param dict to {'a/b/c': shape}."""
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_leaf_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def _assert_tree_matches(converted, expected):
    got = _leaf_shapes(converted)
    want = _leaf_shapes(expected)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"converter missed leaves: {missing[:8]}"
    assert not extra, f"converter produced unknown leaves: {extra[:8]}"
    bad = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not bad, f"shape mismatches: {bad[:8]}"


# ---------------------------------------------------------------------------
# diffusers UNet2DConditionModel
# ---------------------------------------------------------------------------


def synthesize_diffusers_unet_state(cfg, rng):
    """Random state dict in the diffusers UNet2DConditionModel layout
    (SD-2.x variant: use_linear_projection=True transformer blocks)."""
    s = {}

    def t(key, *shape):
        s[key] = rng.standard_normal(shape).astype(np.float32) * 0.02

    ch0 = cfg.block_out_channels[0]
    tdim = ch0 * 4
    ctx = cfg.cross_attention_dim

    t("time_embedding.linear_1.weight", tdim, ch0)
    t("time_embedding.linear_1.bias", tdim)
    t("time_embedding.linear_2.weight", tdim, tdim)
    t("time_embedding.linear_2.bias", tdim)
    t("conv_in.weight", ch0, cfg.in_channels, 3, 3)
    t("conv_in.bias", ch0)
    t("conv_norm_out.weight", ch0)
    t("conv_norm_out.bias", ch0)
    t("conv_out.weight", cfg.out_channels, ch0, 3, 3)
    t("conv_out.bias", cfg.out_channels)

    def resnet(src, cin, cout):
        t(f"{src}.norm1.weight", cin)
        t(f"{src}.norm1.bias", cin)
        t(f"{src}.conv1.weight", cout, cin, 3, 3)
        t(f"{src}.conv1.bias", cout)
        t(f"{src}.time_emb_proj.weight", cout, tdim)
        t(f"{src}.time_emb_proj.bias", cout)
        t(f"{src}.norm2.weight", cout)
        t(f"{src}.norm2.bias", cout)
        t(f"{src}.conv2.weight", cout, cout, 3, 3)
        t(f"{src}.conv2.bias", cout)
        if cin != cout:
            t(f"{src}.conv_shortcut.weight", cout, cin, 1, 1)
            t(f"{src}.conv_shortcut.bias", cout)

    def transformer(src, ch):
        t(f"{src}.norm.weight", ch)
        t(f"{src}.norm.bias", ch)
        t(f"{src}.proj_in.weight", ch, ch)
        t(f"{src}.proj_in.bias", ch)
        t(f"{src}.proj_out.weight", ch, ch)
        t(f"{src}.proj_out.bias", ch)
        blk = f"{src}.transformer_blocks.0"
        for i, attn in ((1, "attn1"), (2, "attn2")):
            kv_in = ch if attn == "attn1" else ctx
            t(f"{blk}.{attn}.to_q.weight", ch, ch)
            t(f"{blk}.{attn}.to_k.weight", ch, kv_in)
            t(f"{blk}.{attn}.to_v.weight", ch, kv_in)
            t(f"{blk}.{attn}.to_out.0.weight", ch, ch)
            t(f"{blk}.{attn}.to_out.0.bias", ch)
            t(f"{blk}.norm{i}.weight", ch)
            t(f"{blk}.norm{i}.bias", ch)
        t(f"{blk}.norm3.weight", ch)
        t(f"{blk}.norm3.bias", ch)
        t(f"{blk}.ff.net.0.proj.weight", 8 * ch, ch)
        t(f"{blk}.ff.net.0.proj.bias", 8 * ch)
        t(f"{blk}.ff.net.2.weight", ch, 4 * ch)
        t(f"{blk}.ff.net.2.bias", ch)

    # Mirror the down/skip/up channel bookkeeping of UNet2DConditionModel
    # (same structure as vegs_tpu.diffusion.unet.UNet2DCondition).
    n = len(cfg.block_out_channels)
    skips = [ch0]
    prev = ch0
    for i, ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", prev, ch)
            prev = ch
            if cfg.with_attention[i]:
                transformer(f"down_blocks.{i}.attentions.{j}", ch)
            skips.append(ch)
        if i < n - 1:
            t(f"down_blocks.{i}.downsamplers.0.conv.weight", ch, ch, 3, 3)
            t(f"down_blocks.{i}.downsamplers.0.conv.bias", ch)
            skips.append(ch)

    mid = cfg.block_out_channels[-1]
    resnet("mid_block.resnets.0", mid, mid)
    transformer("mid_block.attentions.0", mid)
    resnet("mid_block.resnets.1", mid, mid)

    prev = mid
    for i in reversed(range(n)):
        ui = n - 1 - i
        ch = cfg.block_out_channels[i]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            resnet(f"up_blocks.{ui}.resnets.{j}", prev + skip, ch)
            prev = ch
            if cfg.with_attention[i]:
                transformer(f"up_blocks.{ui}.attentions.{j}", ch)
        if i > 0:
            t(f"up_blocks.{ui}.upsamplers.0.conv.weight", ch, ch, 3, 3)
            t(f"up_blocks.{ui}.upsamplers.0.conv.bias", ch)
    return s


def test_convert_diffusers_unet_roundtrip():
    from vegs_tpu.diffusion.unet import UNet2DCondition, UNetConfig, init_unet
    from vegs_tpu.diffusion.weights import convert_unet_state

    cfg = UNetConfig.tiny()
    rng = np.random.default_rng(0)
    state = synthesize_diffusers_unet_state(cfg, rng)
    params = convert_unet_state(state, cfg)

    expected = init_unet(jax.random.key(0), cfg, image_size=8)
    _assert_tree_matches(params["params"], expected["params"])

    # spot-check one transform: torch linear [O, I] must arrive transposed
    np.testing.assert_allclose(
        np.asarray(params["params"]["time_dense1"]["kernel"]),
        state["time_embedding.linear_1.weight"].T)

    sample = jnp.asarray(rng.standard_normal((1, 8, 8, cfg.in_channels)),
                         jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, cfg.cross_attention_dim)),
                      jnp.float32)
    out = UNet2DCondition(cfg).apply(
        params, sample, jnp.array([10], jnp.int32), ctx)
    assert out.shape == (1, 8, 8, cfg.out_channels)
    assert bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------------------------
# diffusers AutoencoderKL
# ---------------------------------------------------------------------------


def synthesize_diffusers_vae_state(cfg, rng):
    """Random state dict in the diffusers AutoencoderKL layout."""
    s = {}

    def t(key, *shape):
        s[key] = rng.standard_normal(shape).astype(np.float32) * 0.02

    def resnet(src, cin, cout):
        t(f"{src}.norm1.weight", cin)
        t(f"{src}.norm1.bias", cin)
        t(f"{src}.conv1.weight", cout, cin, 3, 3)
        t(f"{src}.conv1.bias", cout)
        t(f"{src}.norm2.weight", cout)
        t(f"{src}.norm2.bias", cout)
        t(f"{src}.conv2.weight", cout, cout, 3, 3)
        t(f"{src}.conv2.bias", cout)
        if cin != cout:
            t(f"{src}.conv_shortcut.weight", cout, cin, 1, 1)
            t(f"{src}.conv_shortcut.bias", cout)

    def attn(src, ch):
        t(f"{src}.group_norm.weight", ch)
        t(f"{src}.group_norm.bias", ch)
        for name in ("to_q", "to_k", "to_v", "to_out.0"):
            t(f"{src}.{name}.weight", ch, ch)
            t(f"{src}.{name}.bias", ch)

    n = len(cfg.block_out_channels)
    ch0, chl = cfg.block_out_channels[0], cfg.block_out_channels[-1]
    lat = cfg.latent_channels

    # encoder
    t("encoder.conv_in.weight", ch0, 3, 3, 3)
    t("encoder.conv_in.bias", ch0)
    prev = ch0
    for i, ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", prev, ch)
            prev = ch
        if i < n - 1:
            t(f"encoder.down_blocks.{i}.downsamplers.0.conv.weight",
              ch, ch, 3, 3)
            t(f"encoder.down_blocks.{i}.downsamplers.0.conv.bias", ch)
    resnet("encoder.mid_block.resnets.0", chl, chl)
    attn("encoder.mid_block.attentions.0", chl)
    resnet("encoder.mid_block.resnets.1", chl, chl)
    t("encoder.conv_norm_out.weight", chl)
    t("encoder.conv_norm_out.bias", chl)
    t("encoder.conv_out.weight", 2 * lat, chl, 3, 3)
    t("encoder.conv_out.bias", 2 * lat)

    # decoder
    t("decoder.conv_in.weight", chl, lat, 3, 3)
    t("decoder.conv_in.bias", chl)
    resnet("decoder.mid_block.resnets.0", chl, chl)
    attn("decoder.mid_block.attentions.0", chl)
    resnet("decoder.mid_block.resnets.1", chl, chl)
    prev = chl
    for i in reversed(range(n)):
        ui = n - 1 - i
        ch = cfg.block_out_channels[i]
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{ui}.resnets.{j}", prev, ch)
            prev = ch
        if i > 0:
            t(f"decoder.up_blocks.{ui}.upsamplers.0.conv.weight", ch, ch, 3, 3)
            t(f"decoder.up_blocks.{ui}.upsamplers.0.conv.bias", ch)
    t("decoder.conv_norm_out.weight", ch0)
    t("decoder.conv_norm_out.bias", ch0)
    t("decoder.conv_out.weight", 3, ch0, 3, 3)
    t("decoder.conv_out.bias", 3)

    t("quant_conv.weight", 2 * lat, 2 * lat, 1, 1)
    t("quant_conv.bias", 2 * lat)
    t("post_quant_conv.weight", lat, lat, 1, 1)
    t("post_quant_conv.bias", lat)
    return s


def test_convert_diffusers_vae_roundtrip():
    from vegs_tpu.diffusion.vae import AutoencoderKL, VAEConfig, init_vae
    from vegs_tpu.diffusion.weights import convert_vae_state

    cfg = VAEConfig.tiny()
    rng = np.random.default_rng(1)
    state = synthesize_diffusers_vae_state(cfg, rng)
    params = convert_vae_state(state, cfg)

    expected = init_vae(jax.random.key(0), cfg, image_size=16)
    _assert_tree_matches(params["params"], expected["params"])

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    vae = AutoencoderKL(cfg)
    mean, logvar = vae.apply(params, x, method=vae.encode_moments)
    rec = vae.apply(params, mean, method=vae.decode)
    assert rec.shape == (1, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(rec))) and bool(
        jnp.all(jnp.isfinite(logvar)))


# ---------------------------------------------------------------------------
# torchvision vgg16 `features`
# ---------------------------------------------------------------------------

# torchvision vgg16 conv layer indices inside `features` (the genuine
# Sequential layout: convs at these positions, ReLU/MaxPool between).
VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def synthesize_torchvision_vgg16_state(rng):
    from vegs_tpu.losses.vgg import VGG16_PLAN

    s = {}
    cin = 3
    it = iter(VGG16_CONV_IDX)
    for ch, n_convs in VGG16_PLAN:
        for _ in range(n_convs):
            i = next(it)
            s[f"features.{i}.weight"] = (
                rng.standard_normal((ch, cin, 3, 3)).astype(np.float32) * 0.02)
            s[f"features.{i}.bias"] = np.zeros(ch, np.float32)
            cin = ch
    return s


def test_convert_torchvision_vgg16_roundtrip():
    from vegs_tpu.losses import vgg

    rng = np.random.default_rng(2)
    state = synthesize_torchvision_vgg16_state(rng)
    params = vgg.load_torch_state_dict(state)

    expected = vgg.init_params(jax.random.key(0), image_hw=(32, 32))
    _assert_tree_matches(params["params"], expected["params"])

    # torch conv [O, I, kh, kw] must arrive as HWIO
    np.testing.assert_allclose(
        np.asarray(params["params"]["conv0_0"]["kernel"]),
        state["features.0.weight"].transpose(2, 3, 1, 0))

    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    feats = vgg.VGG16Features().apply(params, x)
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]
    assert all(bool(jnp.all(jnp.isfinite(f))) for f in feats)


# ---------------------------------------------------------------------------
# omnidata DPT-hybrid normal checkpoint
# ---------------------------------------------------------------------------


def synthesize_omnidata_dpt_state(cfg, rng):
    """Random state dict in the omnidata `omnidata_dpt_normal_v2.ckpt`
    layout after the `model.` prefix strip (timm vit_base_r50_s16_384 under
    pretrained.model.*, DPT glue under pretrained.act_postprocess*/
    scratch.* — /root/reference/omnidata/modules/midas/vit.py:345-480,
    blocks.py:49-73, dpt_depth.py:91-99). Includes the dead tensors real
    checkpoints carry (model.norm, refinenet4.resConfUnit1)."""
    s = {}

    def t(key, *shape):
        s[key] = rng.standard_normal(shape).astype(np.float32) * 0.02

    w, e, f = cfg.resnet_width, cfg.embed_dim, cfg.features
    bb = "pretrained.model.patch_embed.backbone"
    t(f"{bb}.stem.conv.weight", w, 3, 7, 7)
    t(f"{bb}.stem.norm.weight", w)
    t(f"{bb}.stem.norm.bias", w)
    cin = w
    for si, nb in enumerate(cfg.resnet_blocks):
        width = w * (2 ** si)
        cout = width * 4
        for bi in range(nb):
            src = f"{bb}.stages.{si}.blocks.{bi}"
            t(f"{src}.norm1.weight", cin)
            t(f"{src}.norm1.bias", cin)
            t(f"{src}.conv1.weight", width, cin, 1, 1)
            t(f"{src}.norm2.weight", width)
            t(f"{src}.norm2.bias", width)
            t(f"{src}.conv2.weight", width, width, 3, 3)
            t(f"{src}.norm3.weight", width)
            t(f"{src}.norm3.bias", width)
            t(f"{src}.conv3.weight", cout, width, 1, 1)
            if cin != cout or (bi == 0 and si > 0):
                t(f"{src}.downsample.conv.weight", cout, cin, 1, 1)
            cin = cout

    t("pretrained.model.patch_embed.proj.weight", e, cin, 1, 1)
    t("pretrained.model.patch_embed.proj.bias", e)
    t("pretrained.model.cls_token", 1, 1, e)
    t("pretrained.model.pos_embed", 1, cfg.patch_grid ** 2 + 1, e)
    for i in range(cfg.depth):
        src = f"pretrained.model.blocks.{i}"
        t(f"{src}.norm1.weight", e)
        t(f"{src}.norm1.bias", e)
        t(f"{src}.attn.qkv.weight", 3 * e, e)
        t(f"{src}.attn.qkv.bias", 3 * e)
        t(f"{src}.attn.proj.weight", e, e)
        t(f"{src}.attn.proj.bias", e)
        t(f"{src}.norm2.weight", e)
        t(f"{src}.norm2.bias", e)
        t(f"{src}.mlp.fc1.weight", 4 * e, e)
        t(f"{src}.mlp.fc1.bias", 4 * e)
        t(f"{src}.mlp.fc2.weight", e, 4 * e)
        t(f"{src}.mlp.fc2.bias", e)
    # dead but present in real checkpoints
    t("pretrained.model.norm.weight", e)
    t("pretrained.model.norm.bias", e)

    t("pretrained.act_postprocess3.3.weight", e, e, 1, 1)
    t("pretrained.act_postprocess3.3.bias", e)
    t("pretrained.act_postprocess4.3.weight", e, e, 1, 1)
    t("pretrained.act_postprocess4.3.bias", e)
    t("pretrained.act_postprocess4.4.weight", e, e, 3, 3)
    t("pretrained.act_postprocess4.4.bias", e)

    rn_in = (4 * w, 8 * w, e, e)
    for li in range(1, 5):
        t(f"scratch.layer{li}_rn.weight", f, rn_in[li - 1], 3, 3)
    for ri in range(1, 5):
        src = f"scratch.refinenet{ri}"
        for su in ("resConfUnit1", "resConfUnit2"):
            for ci in (1, 2):
                t(f"{src}.{su}.conv{ci}.weight", f, f, 3, 3)
                t(f"{src}.{su}.conv{ci}.bias", f)
        t(f"{src}.out_conv.weight", f, f, 1, 1)
        t(f"{src}.out_conv.bias", f)

    t("scratch.output_conv.0.weight", f // 2, f, 3, 3)
    t("scratch.output_conv.0.bias", f // 2)
    t("scratch.output_conv.2.weight", 32, f // 2, 3, 3)
    t("scratch.output_conv.2.bias", 32)
    t("scratch.output_conv.4.weight", cfg.out_channels, 32, 1, 1)
    t("scratch.output_conv.4.bias", cfg.out_channels)
    return s


def test_convert_omnidata_dpt_roundtrip():
    from vegs_tpu.priors.dpt import (DPTConfig, DPTNormal,
                                     convert_omnidata_state, init_dpt)

    cfg = DPTConfig.tiny()
    rng = np.random.default_rng(3)
    state = synthesize_omnidata_dpt_state(cfg, rng)
    params, unmapped = convert_omnidata_state(state, cfg)
    assert unmapped == [], f"unexpected unmapped keys: {unmapped[:8]}"

    expected = init_dpt(jax.random.key(0), cfg)
    _assert_tree_matches(params["params"], expected["params"])

    # weight standardization must be applied to backbone convs
    stem = np.asarray(params["params"]["stem"]["conv_stem"]["kernel"])
    per_filter_mean = stem.mean(axis=(0, 1, 2))
    np.testing.assert_allclose(per_filter_mean,
                               np.zeros_like(per_filter_mean), atol=1e-5)

    x = jnp.asarray(
        rng.standard_normal((1, cfg.image_size, cfg.image_size, 3)),
        jnp.float32)
    n = DPTNormal(cfg).apply(params, x)
    assert n.shape == (1, cfg.image_size, cfg.image_size, 3)
    norms = jnp.linalg.norm(n, axis=-1)
    assert bool(jnp.all(jnp.isfinite(n)))
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-3)


def test_convert_omnidata_dpt_reports_unknown_keys():
    from vegs_tpu.priors.dpt import DPTConfig, convert_omnidata_state

    cfg = DPTConfig.tiny()
    rng = np.random.default_rng(4)
    state = synthesize_omnidata_dpt_state(cfg, rng)
    state["scratch.layer5_rn.weight"] = np.zeros((1, 1, 3, 3), np.float32)
    _, unmapped = convert_omnidata_state(state, cfg)
    assert unmapped == ["scratch.layer5_rn.weight"]
