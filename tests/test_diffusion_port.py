"""Diffusers-checkpoint -> flax weight port (diffusion/port.py).

Golden-name check: the torch state-dict keys below are enumerated
INDEPENDENTLY, following the documented diffusers parameter naming for
UNet2DConditionModel / AutoencoderKL (the models the reference loads at
/root/reference/tinysplat/diffusion/pipeline.py:92-93). The converter must
consume exactly these keys (none missing, none unused) and the filled flax
models must run forward.
"""
import json
import struct

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tinysplat_tpu.diffusion.port import (
    convert_state_dict,
    load_unet,
    load_vae,
    read_safetensors,
)

UNET_CFG = dict(
    sample_size=8, in_channels=4, out_channels=4,
    block_out_channels=[8, 16], layers_per_block=1,
    down_block_types=["CrossAttnDownBlock2D", "DownBlock2D"],
    up_block_types=["UpBlock2D", "CrossAttnUpBlock2D"],
    cross_attention_dim=8, attention_head_dim=2, norm_num_groups=4,
)
VAE_CFG = dict(
    sample_size=16, in_channels=3, out_channels=3, latent_channels=4,
    block_out_channels=[8, 16], layers_per_block=1, norm_num_groups=4,
)


def _resnet_keys(prefix, has_temb, has_shortcut):
    ks = [f"{prefix}.norm1.weight", f"{prefix}.norm1.bias",
          f"{prefix}.conv1.weight", f"{prefix}.conv1.bias",
          f"{prefix}.norm2.weight", f"{prefix}.norm2.bias",
          f"{prefix}.conv2.weight", f"{prefix}.conv2.bias"]
    if has_temb:
        ks += [f"{prefix}.time_emb_proj.weight", f"{prefix}.time_emb_proj.bias"]
    if has_shortcut:
        ks += [f"{prefix}.conv_shortcut.weight", f"{prefix}.conv_shortcut.bias"]
    return ks


def _attn_block_keys(prefix):
    ks = [f"{prefix}.norm.weight", f"{prefix}.norm.bias",
          f"{prefix}.proj_in.weight", f"{prefix}.proj_in.bias",
          f"{prefix}.proj_out.weight", f"{prefix}.proj_out.bias"]
    tb = f"{prefix}.transformer_blocks.0"
    for attn in ("attn1", "attn2"):
        ks += [f"{tb}.{attn}.to_q.weight", f"{tb}.{attn}.to_k.weight",
               f"{tb}.{attn}.to_v.weight", f"{tb}.{attn}.to_out.0.weight",
               f"{tb}.{attn}.to_out.0.bias"]
    ks += [f"{tb}.norm1.weight", f"{tb}.norm1.bias",
           f"{tb}.norm2.weight", f"{tb}.norm2.bias",
           f"{tb}.norm3.weight", f"{tb}.norm3.bias",
           f"{tb}.ff.net.0.proj.weight", f"{tb}.ff.net.0.proj.bias",
           f"{tb}.ff.net.2.weight", f"{tb}.ff.net.2.bias"]
    return ks


def unet_torch_keys():
    ks = ["conv_in.weight", "conv_in.bias",
          "time_embedding.linear_1.weight", "time_embedding.linear_1.bias",
          "time_embedding.linear_2.weight", "time_embedding.linear_2.bias",
          "conv_norm_out.weight", "conv_norm_out.bias",
          "conv_out.weight", "conv_out.bias"]
    # down block 0: CrossAttn, ch 8 (in 8 -> no shortcut), 1 layer + down
    ks += _resnet_keys("down_blocks.0.resnets.0", True, False)
    ks += _attn_block_keys("down_blocks.0.attentions.0")
    ks += ["down_blocks.0.downsamplers.0.conv.weight",
           "down_blocks.0.downsamplers.0.conv.bias"]
    # down block 1: plain, 8 -> 16 (shortcut), no downsampler (last)
    ks += _resnet_keys("down_blocks.1.resnets.0", True, True)
    # mid
    ks += _resnet_keys("mid_block.resnets.0", True, False)
    ks += _attn_block_keys("mid_block.attentions.0")
    ks += _resnet_keys("mid_block.resnets.1", True, False)
    # up block 0 (plain, ch 16): layers_per_block+1 = 2 resnets, skip concats
    # change in_ch -> shortcut present; upsampler present (not last)
    ks += _resnet_keys("up_blocks.0.resnets.0", True, True)
    ks += _resnet_keys("up_blocks.0.resnets.1", True, True)
    ks += ["up_blocks.0.upsamplers.0.conv.weight",
           "up_blocks.0.upsamplers.0.conv.bias"]
    # up block 1 (CrossAttn, ch 8)
    ks += _resnet_keys("up_blocks.1.resnets.0", True, True)
    ks += _attn_block_keys("up_blocks.1.attentions.0")
    ks += _resnet_keys("up_blocks.1.resnets.1", True, True)
    ks += _attn_block_keys("up_blocks.1.attentions.1")
    return ks


def vae_torch_keys():
    ks = []
    for side in ("encoder", "decoder"):
        ks += [f"{side}.conv_in.weight", f"{side}.conv_in.bias",
               f"{side}.conv_norm_out.weight", f"{side}.conv_norm_out.bias",
               f"{side}.conv_out.weight", f"{side}.conv_out.bias"]
        mid = f"{side}.mid_block"
        ks += _resnet_keys(f"{mid}.resnets.0", False, False)
        ks += _resnet_keys(f"{mid}.resnets.1", False, False)
        ks += [f"{mid}.attentions.0.group_norm.weight",
               f"{mid}.attentions.0.group_norm.bias",
               f"{mid}.attentions.0.to_q.weight", f"{mid}.attentions.0.to_q.bias",
               f"{mid}.attentions.0.to_k.weight", f"{mid}.attentions.0.to_k.bias",
               f"{mid}.attentions.0.to_v.weight", f"{mid}.attentions.0.to_v.bias",
               f"{mid}.attentions.0.to_out.0.weight",
               f"{mid}.attentions.0.to_out.0.bias"]
    # encoder: blocks 0 (ch8, no shortcut) + downsampler, 1 (8->16 shortcut)
    ks += _resnet_keys("encoder.down_blocks.0.resnets.0", False, False)
    ks += ["encoder.down_blocks.0.downsamplers.0.conv.weight",
           "encoder.down_blocks.0.downsamplers.0.conv.bias"]
    ks += _resnet_keys("encoder.down_blocks.1.resnets.0", False, True)
    # decoder: reversed channels (16 then 8), layers_per_block+1 = 2 resnets
    ks += _resnet_keys("decoder.up_blocks.0.resnets.0", False, False)
    ks += _resnet_keys("decoder.up_blocks.0.resnets.1", False, False)
    ks += ["decoder.up_blocks.0.upsamplers.0.conv.weight",
           "decoder.up_blocks.0.upsamplers.0.conv.bias"]
    ks += _resnet_keys("decoder.up_blocks.1.resnets.0", False, True)
    ks += _resnet_keys("decoder.up_blocks.1.resnets.1", False, False)
    ks += ["quant_conv.weight", "quant_conv.bias",
           "post_quant_conv.weight", "post_quant_conv.bias"]
    return ks


def _fake_sd(keys, shapes):
    rng = np.random.default_rng(0)
    return {k: rng.normal(scale=0.05, size=shapes[k]).astype(np.float32)
            for k in keys}


def _shapes_from_flax(params, keys):
    """Invert the converter's transforms to get torch-side shapes."""
    from tinysplat_tpu.diffusion.port import _torch_key

    shapes = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        fp = tuple(str(getattr(p, "key", p)) for p in path)
        key = _torch_key(fp)
        s = tuple(leaf.shape)
        if fp[-1] == "kernel" and len(s) == 4:
            s = (s[3], s[2], s[0], s[1])
        elif fp[-1] == "kernel" and len(s) == 2:
            s = (s[1], s[0])
        shapes[key] = s
    missing = [k for k in keys if k not in shapes]
    assert not missing, f"flax tree lacks golden keys: {missing[:8]}"
    return shapes


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_unet_port_golden_names():
    from tinysplat_tpu.diffusion.sd_unet import UNet2DConditionModel

    model = UNet2DConditionModel(UNET_CFG)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 3, 8))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)

    keys = unet_torch_keys()
    assert len(set(keys)) == len(keys)
    shapes = _shapes_from_flax(params, keys)
    assert set(shapes) == set(keys), (
        f"extra flax keys: {sorted(set(shapes) - set(keys))[:8]} / "
        f"missing: {sorted(set(keys) - set(shapes))[:8]}"
    )
    sd = _fake_sd(keys, shapes)
    filled, unused = convert_state_dict(sd, params)
    assert not unused
    out = model.apply(filled, x, t, ctx)
    assert out.shape == (1, 8, 8, 4) and bool(jnp.isfinite(out).all())


def test_vae_port_golden_names():
    from tinysplat_tpu.diffusion.sd_vae import SDAutoencoderKL

    model = SDAutoencoderKL(VAE_CFG)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))

    keys = vae_torch_keys()
    assert len(set(keys)) == len(keys)
    shapes = _shapes_from_flax(params, keys)
    assert set(shapes) == set(keys), (
        f"extra flax keys: {sorted(set(shapes) - set(keys))[:8]} / "
        f"missing: {sorted(set(keys) - set(shapes))[:8]}"
    )
    sd = _fake_sd(keys, shapes)
    filled, unused = convert_state_dict(sd, params)
    assert not unused
    img, z = model.apply(filled, x, jax.random.PRNGKey(2))
    assert img.shape == (1, 16, 16, 3) and bool(jnp.isfinite(img).all())


def test_vae_port_legacy_attention_names():
    """Pre-0.16 diffusers VAE checkpoints name the attention projections
    query/key/value/proj_attn; the converter must alias them."""
    from tinysplat_tpu.diffusion.sd_vae import SDAutoencoderKL

    model = SDAutoencoderKL(VAE_CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                        jax.random.PRNGKey(1))
    keys = vae_torch_keys()
    shapes = _shapes_from_flax(params, keys)
    legacy = {}
    for k in keys:
        lk = (k.replace("to_q", "query").replace("to_k", "key")
               .replace("to_v", "value").replace("to_out.0", "proj_attn"))
        legacy[lk] = shapes[k]
    sd = _fake_sd(list(legacy), legacy)
    filled, unused = convert_state_dict(sd, params)
    assert not unused


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_full_directory_load(tmp_path):
    """End-to-end: write a diffusers-format dir (config.json + first-party
    safetensors) and load through the public entry points."""
    from tinysplat_tpu.diffusion.sd_unet import UNet2DConditionModel

    model = UNet2DConditionModel(UNET_CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3, 8)))
    keys = unet_torch_keys()
    shapes = _shapes_from_flax(params, keys)
    sd = _fake_sd(keys, shapes)

    d = tmp_path / "unet"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(UNET_CFG))
    # Write safetensors (8-byte LE header len + JSON + raw LE buffers).
    header, bufs, off = {}, [], 0
    for k, v in sd.items():
        b = v.astype("<f4").tobytes()
        header[k] = {"dtype": "F32", "shape": list(v.shape),
                     "data_offsets": [off, off + len(b)]}
        bufs.append(b)
        off += len(b)
    hj = json.dumps(header).encode()
    with open(d / "diffusion_pytorch_model.safetensors", "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for b in bufs:
            f.write(b)

    rt = read_safetensors(str(d / "diffusion_pytorch_model.safetensors"))
    np.testing.assert_array_equal(rt["conv_in.weight"], sd["conv_in.weight"])

    model2, params2 = load_unet(str(d))
    out = model2.apply(params2, jnp.zeros((2, 8, 8, 4)),
                       jnp.asarray([1, 5]), jnp.zeros((2, 3, 8)))
    assert out.shape == (2, 8, 8, 4) and bool(jnp.isfinite(out).all())


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_pipeline_from_pretrained(tmp_path):
    """Pipeline loads a local diffusers-format directory end-to-end and
    generates (stock-SD layout: no feature-volume channels -> feature
    conditioning disabled)."""
    from tinysplat_tpu.diffusion.pipeline import TinysplatDiffusionPipeline
    from tinysplat_tpu.diffusion.sd_unet import UNet2DConditionModel
    from tinysplat_tpu.diffusion.sd_vae import SDAutoencoderKL

    def write_dir(subdir, cfg, model, init_args):
        d = tmp_path / subdir
        d.mkdir()
        (d / "config.json").write_text(json.dumps(cfg))
        params = model.init(jax.random.PRNGKey(0), *init_args)
        from tinysplat_tpu.diffusion.port import _torch_key

        header, bufs, off = {}, [], 0
        rng = np.random.default_rng(1)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            fp = tuple(str(getattr(p, "key", p)) for p in path)
            key = _torch_key(fp)
            s = tuple(leaf.shape)
            if fp[-1] == "kernel" and len(s) == 4:
                s = (s[3], s[2], s[0], s[1])
            elif fp[-1] == "kernel" and len(s) == 2:
                s = (s[1], s[0])
            v = rng.normal(scale=0.05, size=s).astype("<f4")
            b = v.tobytes()
            header[key] = {"dtype": "F32", "shape": list(s),
                           "data_offsets": [off, off + len(b)]}
            bufs.append(b)
            off += len(b)
        hj = json.dumps(header).encode()
        with open(d / "diffusion_pytorch_model.safetensors", "wb") as f:
            f.write(struct.pack("<Q", len(hj)))
            f.write(hj)
            for b in bufs:
                f.write(b)

    write_dir("unet", UNET_CFG, UNet2DConditionModel(UNET_CFG),
              (jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
               jnp.zeros((1, 3, 8))))
    write_dir("vae", VAE_CFG, SDAutoencoderKL(VAE_CFG),
              (jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(1)))
    (tmp_path / "scheduler").mkdir()
    (tmp_path / "scheduler" / "scheduler_config.json").write_text(
        json.dumps({"num_train_timesteps": 50, "beta_schedule": "linear",
                    "beta_start": 0.001, "beta_end": 0.01}))

    pipe = TinysplatDiffusionPipeline.from_pretrained(str(tmp_path))
    assert pipe.feature_encoder is None  # stock 4-channel unet
    assert pipe.scheduler.num_train_timesteps == 50

    from tinysplat_tpu.diffusion.pipeline import _dummy_cams

    B = 1
    cams_in = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (B, 2) + x.shape[1:]), _dummy_cams(B))
    out = pipe(
        init_images=jnp.zeros((B, 3, 16, 16)),
        target_cameras=_dummy_cams(B),
        input_cameras=cams_in,
        input_images=jnp.zeros((B, 2, 3, 16, 16)),
        num_inference_steps=3,
        guidance_scale=1.0,
        key=jax.random.PRNGKey(2),
    )
    assert out.shape == (B, 3, 16, 16) and bool(jnp.isfinite(out).all())


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_clip_text_encoder_matches_transformers(tmp_path):
    """NUMERICAL golden test: the flax CLIPTextModel ported from a real
    torch transformers checkpoint must reproduce its hidden states."""
    import torch
    from transformers import CLIPTextConfig
    from transformers import CLIPTextModel as TorchCLIP

    from tinysplat_tpu.diffusion.port import load_text_encoder

    tcfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=37,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, eos_token_id=98, bos_token_id=97,
    )
    torch.manual_seed(0)
    tm = TorchCLIP(tcfg).eval()
    d = tmp_path / "text_encoder"
    d.mkdir()
    (d / "config.json").write_text(tcfg.to_json_string())
    torch.save(tm.state_dict(), d / "pytorch_model.bin")

    model, params = load_text_encoder(str(d))

    ids = np.array([[3, 17, 58, 97, 7, 98], [97, 5, 2, 98, 11, 1]], np.int32)  # eos overridden to 98
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids.astype(np.int64)))
    hidden, pooled = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(hidden), ref.last_hidden_state.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(pooled), ref.pooler_output.numpy(), atol=2e-5
    )
