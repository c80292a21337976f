"""Two-minute end-to-end smoke on the current backend (CPU or TPU):
tiny models through every major subsystem.  Exit code 0 = healthy.

Usage: PYTHONPATH=.:$PYTHONPATH python tools/smoke.py [--cpu]
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    if '--cpu' in sys.argv:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp
    import numpy as np

    import paintmind_tpu as pm
    import paintmind_tpu.config as pmc
    from paintmind_tpu.models import pipeline as pl
    from paintmind_tpu.models import vqmodel as vm

    print('backend:', jax.default_backend(), jax.devices())
    tiny = {
        'n_embed': 64, 'embed_dim': 8, 'beta': 0.25,
        'enc': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 2,
                'num_head': 2, 'mlp_dim': 64, 'in_channels': 3,
                'dim_head': 16, 'dropout': 0.0},
        'dec': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 2,
                'num_head': 2, 'mlp_dim': 64, 'out_channels': 3,
                'dim_head': 16, 'dropout': 0.0},
    }
    pmc.register_version('smoke-vqgan', tiny)
    rng = np.random.default_rng(0)

    # stage-1 forward + training step
    model = pm.create_model(arch='vqgan', version='smoke-vqgan',
                            pretrained=False)
    x = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    rec, loss = model(x)
    assert rec.shape == x.shape and np.isfinite(float(loss))
    print('stage-1 forward OK  loss=%.4f' % float(loss))

    # stage-2 pipeline loss + 4-step generate + inpaint
    cfg = pl.PipelineConfig(stage1='smoke-vqgan', dim=32, dim_head=16,
                            mlp_dim=64, num_head=2, depth=2, dropout=0.0,
                            vqc=vm.VQModelConfig.from_dict(tiny), t5_dim=48)
    pipe = pl.Pipeline(cfg, stage1_pretrained=False, text_encoder=None)
    ctx = rng.standard_normal((4, 5, 48)).astype(np.float32)
    loss = pipe(x, text=ctx, mask_ratio=0.6)
    assert np.isfinite(float(loss))
    imgs = pipe.generate(text=ctx, timesteps=4, topk=3, decode_steps='final')
    assert imgs[0].shape == (4, 32, 32, 3)
    out = pipe.inpaint(x, (8, 8, 16, 16), text=ctx, timesteps=2)
    assert out.shape == x.shape
    print('stage-2 loss/generate/inpaint OK  loss=%.4f' % float(loss))

    # one real train step each
    from paintmind_tpu import optim
    from paintmind_tpu.train import steps as ts
    g_tx = optim.adam(1e-4, max_grad_norm=1.0)
    d_tx = optim.adam(1e-4, max_grad_norm=1.0)
    vstate = ts.init_vqgan_train_state(jax.random.PRNGKey(0), model.params,
                                       g_tx, d_tx)
    vstep = jax.jit(ts.make_vqgan_train_step(model.config, g_tx, d_tx,
                                             grad_accum=2))
    vstate, vm_ = vstep(vstate, jnp.asarray(x))
    tx = ts.masked_tx(optim.lion(1e-4), pipe.params)
    pstate = ts.init_pipeline_train_state(jax.random.PRNGKey(1), pipe.params, tx)
    pstep = jax.jit(ts.make_pipeline_train_step(cfg, tx, grad_accum=2))
    pstate, pm_ = pstep(pstate, jnp.asarray(x), jnp.asarray(ctx),
                        jnp.asarray(0.7))
    assert np.isfinite(float(vm_['loss'])) and np.isfinite(float(pm_['loss']))
    print('train steps OK  g=%.4f maskgit=%.4f' % (float(vm_['loss']),
                                                   float(pm_['loss'])))
    print('SMOKE PASS')


if __name__ == '__main__':
    main()
