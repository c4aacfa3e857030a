"""Train a tiny novel-view diffusion prior in-sandbox (VERDICT r4 item 8).

The reference ships --regularize-diffusion wiring but no efficacy evidence
(its diffusion module is never imported by training, and this sandbox has
no pretrained checkpoint). This trains the first-party flax pipeline
(diffusion/pipeline.py tiny topology) from scratch on renders of the
quality-bench GT scene, so diffusion_ab.py can A/B few-view training with a
prior that has actually SEEN the scene distribution:

  phase 1 — AutoencoderKL: sampled-latent reconstruction (+ latent-scale
            shrinkage standing in for the KL term at this size);
  phase 2 — conditional denoiser (feature encoder + aggregator +
            EmbeddingMLP + UNet) with the epsilon-prediction DDPM objective
            on frozen-VAE latents, conditioned on two posed input views via
            the PixelNeRF feature volume; 10% conditioning dropout keeps
            classifier-free guidance usable.

Writes a native checkpoint (pipeline.save_native) to --out-dir.
Run on the chip: python scripts/train_diffusion_prior.py
"""
import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, default=96)
    p.add_argument("--sample-size", type=int, default=16,
                   help="latent resolution; images are 8x larger")
    p.add_argument("--vae-steps", type=int, default=1500)
    p.add_argument("--unet-steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--cfg-dropout", type=float, default=0.1)
    p.add_argument("--out-dir", default="/tmp/diffusion_prior")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("prior")

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from tinysplat_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from quality_bench import make_gt_scene
    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.diffusion.pipeline import TinysplatDiffusionPipeline
    from tinysplat_tpu.models.gaussians import init_from_pcd
    from tinysplat_tpu.render import render

    S = args.sample_size * 8  # image side
    rng = np.random.default_rng(args.seed)

    # --- dataset: posed renders of the GT scene --------------------------
    means, log_scales, quats, colors, opac = make_gt_scene(
        n_clusters=40, per_cluster=400, seed=args.seed)
    n = len(means)
    gt_state = init_from_pcd(means, colors * 255.0, sh_degree=1, capacity=n)
    gt_state = dataclasses.replace(gt_state, params=dataclasses.replace(
        gt_state.params, scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats), opacities=jnp.asarray(opac)))
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
    cams = orbit_cameras(args.views, width=S, height=S, radius=3.2, fov=0.9)

    @jax.jit
    def render_view(cp):
        rgb, _ = render(gt_state.params, gt_state.alive, cp, S, S,
                        active_sh_degree=jnp.int32(1),
                        background=jnp.zeros(3), rasterizer=backend,
                        dup_capacity=24 * n, span_capacity=10 * n,
                        max_per_tile=16384)
        return rgb

    log.info("rendering %d posed views at %dx%d", len(cams), S, S)
    imgs = np.stack([np.asarray(jax.device_get(render_view(c.params())))
                     for c in cams])  # (V, S, S, 3) in [0, 1]
    cam_params = [c.params() for c in cams]

    pipe = TinysplatDiffusionPipeline.tiny(
        jax.random.PRNGKey(args.seed), sample_size=args.sample_size)
    params = dict(pipe.params)
    sched = pipe.scheduler
    imgs_dev = jnp.asarray(imgs.transpose(0, 3, 1, 2)) * 2.0 - 1.0  # (V,3,S,S)
    S_fe = pipe.feature_encoder.sample_size
    imgs_fe = jax.image.resize(jnp.asarray(imgs.transpose(0, 3, 1, 2)),
                               (len(cams), 3, S_fe, S_fe), "linear")  # [0,1]
    cams_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *cam_params)

    # --- phase 1: VAE ------------------------------------------------------
    vae = pipe.vae
    opt = optax.adam(args.lr)
    vst = opt.init(params["vae"])

    @jax.jit
    def vae_step(p_vae, vst, idx, key):
        x = imgs_dev[idx]  # (B, 3, S, S)

        def loss_fn(pv):
            out, z = vae.apply(pv, x, key)
            lat = z / vae.scaling_factor
            return (jnp.mean((out - x) ** 2)
                    + 1e-4 * jnp.mean(lat ** 2)), out

        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p_vae)
        up, vst = opt.update(g, vst)
        return optax.apply_updates(p_vae, up), vst, l

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.perf_counter()
    for i in range(args.vae_steps):
        key, k1 = jax.random.split(key)
        idx = jnp.asarray(rng.integers(0, len(cams), args.batch))
        params["vae"], vst, l = vae_step(params["vae"], vst, idx, k1)
        if (i + 1) % 250 == 0:
            log.info("vae step %d: loss %.5f", i + 1, float(jax.device_get(l)))
    log.info("vae phase done in %.1f min", (time.perf_counter() - t0) / 60)

    # --- phase 2: conditional denoiser -------------------------------------
    fe, fa, em, unet = (pipe.feature_encoder, pipe.feature_aggregator,
                        pipe.embedding_mlp, pipe.unet)
    train_keys = ("fe", "fa", "em", "unet")
    tparams = {k: params[k] for k in train_keys}
    opt2 = optax.adam(args.lr * 0.5)
    ust = opt2.init(tparams)
    E = em.embed_dim

    @jax.jit
    def unet_step(tp, p_vae, ust, tgt_idx, in_idx, key):
        kz, kt, ke, kd = jax.random.split(key, 4)
        x = imgs_dev[tgt_idx]  # (B, 3, S, S)
        B = x.shape[0]
        cam_t = jax.tree.map(lambda a: a[tgt_idx], cams_stack)
        cam_in = jax.tree.map(lambda a: a[in_idx], cams_stack)  # (B, 2, ...)
        in_imgs = imgs_fe[in_idx]  # (B, 2, 3, S_fe, S_fe)

        def loss_fn(tp):
            lat0 = vae.apply(p_vae, x, kz, method=type(vae).encode)
            t = jax.random.randint(kt, (B,), 0, sched.num_train_timesteps)
            eps = jax.random.normal(ke, lat0.shape)
            a = sched.alphas_cumprod[t][:, None, None, None]
            lat_t = jnp.sqrt(a) * lat0 + jnp.sqrt(1.0 - a) * eps
            feats, xyz = fe.apply(tp["fe"], cam_t, in_imgs, cam_in)
            feat_lat = fa.apply(tp["fa"], feats, xyz)
            # conditioning dropout: zero the feature volume per-sample
            drop = (jax.random.uniform(kd, (B, 1, 1, 1))
                    < args.cfg_dropout)
            feat_lat = jnp.where(drop, 0.0, feat_lat)
            prompt = em.apply(tp["em"], jnp.zeros((B, 2, E)),
                              jnp.zeros((B, 2, E)))
            lat_in = jnp.concatenate([lat_t, feat_lat], axis=1)
            pred = unet.apply(tp["unet"], lat_in, t.astype(jnp.float32),
                              prompt)
            return jnp.mean((pred - eps) ** 2)

        l, g = jax.value_and_grad(loss_fn)(tp)
        up, ust = opt2.update(g, ust)
        return optax.apply_updates(tp, up), ust, l

    t0 = time.perf_counter()
    losses = []
    for i in range(args.unet_steps):
        key, k1 = jax.random.split(key)
        tgt = rng.integers(0, len(cams), args.batch)
        # conditioning views: the two orbit neighbors of the target
        in_idx = np.stack([(tgt - 1) % len(cams), (tgt + 1) % len(cams)],
                          axis=1)
        tparams, ust, l = unet_step(tparams, params["vae"], ust,
                                    jnp.asarray(tgt), jnp.asarray(in_idx), k1)
        if (i + 1) % 500 == 0:
            lv = float(jax.device_get(l))
            losses.append(round(lv, 4))
            log.info("denoiser step %d: eps-mse %.4f", i + 1, lv)
    log.info("denoiser phase done in %.1f min", (time.perf_counter() - t0) / 60)

    params.update(jax.device_get(tparams))
    pipe = dataclasses.replace(pipe, params=params)
    pipe.save_native(args.out_dir)
    meta = {"views": args.views, "image_size": S,
            "vae_steps": args.vae_steps, "unet_steps": args.unet_steps,
            "final_eps_mse": losses[-1] if losses else None,
            "loss_curve": losses}
    with open(os.path.join(args.out_dir, "training.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps({"metric": "diffusion_prior_eps_mse",
                      "value": losses[-1] if losses else None,
                      "out_dir": args.out_dir}), flush=True)


if __name__ == "__main__":
    main()
