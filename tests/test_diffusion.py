"""Diffusion subsystem smoke + shape tests (tiny random-init configs).

The reference's diffusion package is unwired and depends on HF-hub pretrained
weights (/root/reference/tinysplat/diffusion/; SURVEY.md L5); these tests
exercise the flax rebuild's full graph at toy sizes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinysplat_tpu.diffusion import (
    AutoencoderKL,
    DDIMScheduler,
    EmbeddingMLP,
    FeatureAggregator,
    FeatureVolumeEncoder,
    TinysplatDiffusionPipeline,
    UNet2D,
    UNet2DCondition,
)
from tinysplat_tpu.diffusion.pipeline import _dummy_cams


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_unet2d_shapes():
    net = UNet2D(sample_size=16, in_channels=3, out_channels=8,
                 block_out_channels=(8, 16))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 16, 16)), jnp.ones((1,)))
    out = net.apply(params, jnp.ones((2, 3, 16, 16)), jnp.ones((1,)))
    assert out.shape == (2, 8, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_condition_shapes():
    # jit init/apply: eager per-op dispatch on XLA:CPU costs ~10x the jitted
    # executable here, and the jitted one persists in the compilation cache.
    net = UNet2DCondition(sample_size=8, in_channels=6, out_channels=4,
                          block_out_channels=(8, 16), cross_attention_dim=32)
    ctx = jnp.ones((2, 5, 32))
    params = jax.jit(net.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, 6, 8, 8)), jnp.ones((1,)), ctx)
    out = jax.jit(net.apply)(params, jnp.ones((2, 6, 8, 8)), jnp.ones((1,)), ctx)
    assert out.shape == (2, 4, 8, 8)


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(latent_channels=4, block_out_channels=(8, 16))
    img = jnp.ones((1, 3, 16, 16))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), img, jax.random.PRNGKey(1))
    enc = jax.jit(lambda p, x, k: vae.apply(p, x, k, method=AutoencoderKL.encode))
    dec = jax.jit(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode))
    z = enc(params, img, jax.random.PRNGKey(1))
    assert z.shape == (1, 4, 4, 4)  # factor 2^len(blocks), as diffusers
    rec = dec(params, z)
    assert rec.shape == (1, 3, 16, 16)
    assert float(jnp.abs(rec).max()) <= 1.0


def test_ddim_scheduler_noising_and_steps():
    s = DDIMScheduler(num_train_timesteps=100)
    ts = s.timesteps(10)
    assert ts.shape == (10,)
    assert int(ts[0]) == 99 and bool((ts[:-1] > ts[1:]).all())
    x = jnp.ones((1, 4, 8, 8))
    noise = jnp.zeros_like(x)
    noisy = s.add_noise(x, noise, ts[0])
    # a_t small at t=99 -> heavily scaled toward zero (no noise added here).
    assert float(jnp.abs(noisy).max()) < 1.0
    # One exact-eps step recovers x0 at prev_t = -1.
    eps = jax.random.normal(jax.random.PRNGKey(0), x.shape)
    xt = s.add_noise(x, eps, ts[-1])
    x0 = s.step(eps, ts[-1], xt, jnp.int32(-1))
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x), atol=1e-4)


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_feature_volume_encoder_shapes():
    fe = FeatureVolumeEncoder(sample_size=16, num_channels=8, latent_dim=8,
                              unet_block_out_channels=(8, 16))
    B, N = 2, 3
    tc = _dummy_cams(B)
    ic = jax.tree.map(lambda x: jnp.broadcast_to(x[:, None], (B, N) + x.shape[1:]), _dummy_cams(B))
    imgs = jnp.ones((B, N, 3, 16, 16)) * 0.5
    params = fe.init(jax.random.PRNGKey(0), tc, imgs, ic)
    feats, xyz = fe.apply(params, tc, imgs, ic)
    assert feats.shape == (B, N, 8, 8, 8)
    assert xyz.shape == (B, N, 3, 8, 8, 8)
    assert np.isfinite(np.asarray(feats)).all()
    assert np.isfinite(np.asarray(xyz)).all()

    fa = FeatureAggregator(input_dim=8, hidden_dim=16, code_len=3)
    pa = fa.init(jax.random.PRNGKey(1), feats, xyz)
    agg = fa.apply(pa, feats, xyz)
    assert agg.shape == (B, 8 + 3, 8, 8)


def test_embedding_mlp_shapes():
    em = EmbeddingMLP(conditioned_images=3, embed_dim=16)
    p = em.init(jax.random.PRNGKey(0), jnp.zeros((2, 2, 16)), jnp.zeros((2, 3, 16)))
    out = em.apply(p, jnp.ones((2, 2, 16)), jnp.ones((2, 3, 16)))
    assert out.shape == (2, 2, 16)


@pytest.mark.slow
def test_pipeline_end_to_end_tiny():
    pipe = TinysplatDiffusionPipeline.tiny(jax.random.PRNGKey(0), sample_size=8)
    B, N = 1, 2
    S = pipe.feature_encoder.sample_size
    tc = _dummy_cams(B)
    ic = jax.tree.map(lambda x: jnp.broadcast_to(x[:, None], (B, N) + x.shape[1:]), _dummy_cams(B))
    out = pipe(
        init_images=jnp.zeros((B, 3, 64, 64)),
        target_cameras=tc,
        input_cameras=ic,
        input_images=jnp.ones((B, N, 3, S, S)) * 0.5,
        num_inference_steps=3,
        guidance_scale=2.0,
        key=jax.random.PRNGKey(1),
    )
    assert out.shape == (B, 3, 64, 64)
    assert np.isfinite(np.asarray(out)).all()
