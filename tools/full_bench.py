"""The five BASELINE.json benchmark configs, measured on the real chip.
Writes bench_report.json and prints a table (bench.py remains the one-line
headline bench the driver consumes).

  1. vit-s-vqgan single-image 256² encode→quantize→decode (pm.reconstruction)
  2. batched reconstruction, batch 16 bf16, on-device stage1_transform
  3. 16-step unconditional token generation + VQGAN detokenize
  4. text-to-image with caption conditioning + classifier-free guidance
  5. VQGAN train step (recon + LPIPS + GAN, grad-accum, bf16)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def fence(x):
    import jax.numpy as jnp
    import jax
    return jax.tree_util.tree_map(
        lambda a: float(jnp.sum(jnp.asarray(a).astype(jnp.float32))), x)


def _quality_images(rng_seed, n):
    """Fixed held-out 256² crops of the real photographs shipped with the
    reference README (see tools/make_photo_corpus.py); falls back to
    fixed-seed noise if the assets are missing."""
    rng = np.random.default_rng(rng_seed)
    try:
        from make_photo_corpus import load_sources, random_crop
        srcs = load_sources()
        crops = [np.asarray(random_crop(srcs[i % len(srcs)], rng),
                            np.float32) / 127.5 - 1.0 for i in range(n)]
        return np.stack(crops)
    except Exception as e:  # offline asset layout changed
        print(f'quality: reference photos unavailable ({e}); using noise',
              file=sys.stderr)
        return rng.uniform(-1, 1, (n, 256, 256, 3)).astype(np.float32)


def timed(fn, n=3):
    fence(fn())
    t0 = time.time()
    for _ in range(n):
        fence(fn())
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    import paintmind_tpu as pm
    from paintmind_tpu.models.pipeline import Pipeline
    from paintmind_tpu.ops.image import stage1_transform_device

    report = {}
    rng = np.random.default_rng(0)

    # -- config 1: single-image reconstruction --------------------------
    vq = pm.create_model(arch='vqgan', version='vit-s-vqgan',
                         pretrained=False, compute_dtype=jnp.bfloat16)
    x1 = rng.standard_normal((1, 256, 256, 3)).astype(np.float32)

    def recon_single():
        return vq.reconstruct(x1)  # one fused program

    dt = timed(recon_single)
    report['1_single_recon'] = {'latency_ms': dt * 1000,
                                'images_per_sec': 1 / dt}

    # -- config 2: batched recon + on-device transform ------------------
    raw = jnp.asarray(rng.integers(0, 255, (16, 384, 384, 3), dtype=np.uint8))

    def recon_batch():
        imgs = stage1_transform_device(raw, jax.random.PRNGKey(0),
                                       is_train=True, dtype=jnp.bfloat16)
        z, _, _ = vq.encode(imgs)
        return vq.decode(z)

    dt = timed(recon_batch)
    report['2_batched_recon_bf16'] = {'latency_ms': dt * 1000,
                                      'images_per_sec': 16 / dt}

    # -- configs 3 + 4: generation --------------------------------------
    pipe = Pipeline(stage1_pretrained=False, text_encoder=None,
                    compute_dtype=jnp.bfloat16)
    B = 32
    ctx = jnp.asarray(rng.standard_normal((B, 77, 1024)).astype(np.float32))

    def gen_uncond():
        return pipe.generate(num_samples=B, timesteps=16, topk=5,
                             decode_steps='final', key=jax.random.PRNGKey(1))

    dt = timed(gen_uncond)
    report['3_uncond_16step'] = {'latency_s': dt, 'images_per_sec': B / dt}

    def gen_cfg():
        return pipe.generate(text=ctx, timesteps=16, topk=5,
                             guidance_scale=3.0, decode_steps='final',
                             key=jax.random.PRNGKey(2))

    dt = timed(gen_cfg)
    report['4_t2i_cfg3'] = {'latency_s': dt, 'images_per_sec': B / dt}

    # -- config 5: VQGAN train step --------------------------------------
    from paintmind_tpu import optim
    from paintmind_tpu.train import steps as ts
    from paintmind_tpu.models.vqmodel import VQModel
    from paintmind_tpu.models import lpips as lpips_mod

    model = VQModel(pm.ver2cfg['vit-s-vqgan'], seed=0)
    g_tx = optim.adam(1e-4, max_grad_norm=1.0)
    d_tx = optim.adam(1e-4, max_grad_norm=1.0)
    lp = lpips_mod.init_lpips(jax.random.PRNGKey(0))
    step = jax.jit(ts.make_vqgan_train_step(
        model.config, g_tx, d_tx, lpips_params=lp, grad_accum=2,
        compute_dtype=jnp.bfloat16))
    state = ts.init_vqgan_train_state(jax.random.PRNGKey(1), model.params,
                                      g_tx, d_tx)
    imgs = jnp.asarray(rng.standard_normal((16, 256, 256, 3)).astype(np.float32))

    def train_step():
        nonlocal state
        state, metrics = step(state, imgs)
        return metrics

    dt = timed(train_step)
    report['5_vqgan_train_step'] = {'latency_s': dt,
                                    'images_per_sec': 16 / dt}

    # -- extra: stage-2 MaskGIT train step -------------------------------
    tx2 = ts.masked_tx(optim.lion(1e-4, weight_decay=0.05,
                                  max_grad_norm=1.0), pipe.params)
    params32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, pipe.params)
    pstate = ts.init_pipeline_train_state(jax.random.PRNGKey(5), params32,
                                          tx2)
    pstep = jax.jit(ts.make_pipeline_train_step(
        pipe.config, tx2, grad_accum=2, compute_dtype=jnp.bfloat16))
    imgs2 = jnp.asarray(rng.standard_normal((16, 256, 256, 3)).astype(np.float32))
    ctx2 = jnp.asarray(rng.standard_normal((16, 77, 1024)).astype(np.float32))

    def train_step2():
        nonlocal pstate
        pstate, metrics = pstep(pstate, imgs2, ctx2,
                                jnp.asarray(0.7, jnp.float32))
        return metrics

    dt = timed(train_step2)
    report['6_paintmind_train_step'] = {'latency_s': dt,
                                        'images_per_sec': 16 / dt}

    # -- quality: rec PSNR + rFID on a fixed image set -------------------
    # (the second half of the driver metric "rec PSNR/rFID"; with no
    # pretrained InceptionV3 weights in this environment the extractor is
    # the documented fixed-seed substitute and the variant says so).
    # Real photographs (the reference README originals) and, when present,
    # the from-scratch-trained tokenizer checkpoint — otherwise the numbers
    # describe a random-init model and 'weights' says so.
    import os
    from paintmind_tpu.utils.metrics import psnr, rfid
    real = _quality_images(rng_seed=123, n=64)
    ckpt = os.environ.get('PM_BENCH_VQGAN')
    if not ckpt:
        cand = os.path.join(os.path.dirname(pm.__file__), 'assets',
                            'vit_vq_photo.npz')
        ckpt = cand if os.path.exists(cand) else None
    if ckpt:
        vq_q = pm.create_model(arch='vqgan', version='vit-s-vqgan',
                               pretrained=False, checkpoint_path=ckpt,
                               compute_dtype=jnp.bfloat16)
        weights = f'trained({os.path.basename(ckpt)})'
    else:
        vq_q, weights = vq, 'random-init'
    rec = np.concatenate([np.asarray(vq_q.reconstruct(real[i:i + 16]),
                                     np.float32)
                          for i in range(0, len(real), 16)])
    val, variant = rfid(real, rec)
    report['7_quality'] = {'rec_psnr_db': psnr(rec, real),
                           'rfid': val, 'rfid_variant': variant,
                           'weights': weights, 'images': 'reference photos'}

    print(json.dumps(report, indent=2))
    with open('bench_report.json', 'w') as f:
        json.dump(report, f, indent=2)


if __name__ == '__main__':
    main()
