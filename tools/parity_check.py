"""One-command full-size parity report: PyTorch reference vs this framework
on identical (randomly initialized) weights.

Builds the reference vit-s-vqgan + CondTransformer on CPU torch, converts
the state_dicts, runs both sides on the same inputs, and prints MAE /
PSNR / index-agreement.  This is the BASELINE correctness gate ("within
1e-2 MAE") executed end-to-end; run on CPU (exact) or TPU (default
precision ≈ bf16 matmuls).

Usage: PYTHONPATH=.:tests:$PYTHONPATH python tools/parity_check.py [--tpu]
"""

from __future__ import annotations

import argparse
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, 'tests')):
    if p not in sys.path:
        sys.path.insert(0, p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tpu', action='store_true',
                    help='run the JAX side on the TPU (default: CPU fp32)')
    args = ap.parse_args()

    import numpy as np
    import torch

    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    sys.path.insert(0, 'tests')
    from reference_oracle import ref_module

    import paintmind_tpu as pm
    from paintmind_tpu.convert import torch_weights as tw
    from paintmind_tpu.models import pipeline as pl
    from paintmind_tpu.models import vqmodel as vm
    from paintmind_tpu.models import transformer as st2
    from paintmind_tpu.utils.metrics import mae, psnr

    rng = np.random.default_rng(0)
    report = []

    # ---- stage 1 -------------------------------------------------------
    vqm = ref_module('stage1.vqmodel')
    torch.manual_seed(0)
    ref_vq = vqm.VQModel(pm.Config(pm.ver2cfg['vit-s-vqgan'])).eval()
    cfg = vm.VQModelConfig.from_dict(pm.ver2cfg['vit-s-vqgan'])
    params = jax.tree_util.tree_map(
        jnp.asarray, tw.convert_vqmodel(ref_vq.state_dict()))

    x = (rng.standard_normal((2, 3, 256, 256)) * 0.5).astype(np.float32)
    with torch.no_grad():
        rec_t, loss_t = ref_vq(torch.tensor(x))
        z_t, _, idx_t = ref_vq.encode(torch.tensor(x))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    rec_j, loss_j = vm.forward(params, xj, cfg)
    _, _, idx_j = vm.encode(params, xj, cfg)
    rec_j = np.asarray(rec_j).transpose(0, 3, 1, 2)
    report.append(('vqgan reconstruction MAE', mae(rec_j, rec_t.numpy())))
    report.append(('vqgan reconstruction PSNR-vs-ref (dB)',
                   psnr(rec_j, rec_t.numpy())))
    report.append(('vq index agreement',
                   float((np.asarray(idx_j) == idx_t.numpy()).mean())))
    report.append(('codebook loss |Δ|', abs(float(loss_j) - float(loss_t))))

    # ---- stage 2 -------------------------------------------------------
    tref = ref_module('stage2.transformer')
    torch.manual_seed(1)
    ref_tr = tref.CondTransformer(32, 1024, 1024, 64, 4096, 16, 12, 0.0,
                                  1024, 8192).eval()
    tcfg = pl.PipelineConfig.from_dict(pm.ver2cfg['paintmindv1']).tcfg
    tparams = jax.tree_util.tree_map(
        jnp.asarray, tw.convert_cond_transformer(ref_tr.state_dict()))
    tokens = rng.standard_normal((1, 1024, 32)).astype(np.float32)
    ctx = rng.standard_normal((1, 77, 1024)).astype(np.float32)
    with torch.no_grad():
        logits_t = ref_tr(torch.tensor(tokens), torch.tensor(ctx)).numpy()
    logits_j = st2.cond_transformer_apply(tparams, jnp.asarray(tokens),
                                          jnp.asarray(ctx), cfg=tcfg)
    report.append(('cond transformer logits MAE', mae(logits_j, logits_t)))
    pj = np.asarray(jax.nn.softmax(jnp.asarray(logits_j), -1))
    pt = torch.softmax(torch.tensor(logits_t), -1).numpy()
    report.append(('transformer argmax agreement',
                   float((pj.argmax(-1) == pt.argmax(-1)).mean())))

    backend = jax.default_backend()
    gate = 1e-2
    print(f'\nparity report (JAX backend: {backend})')
    print('-' * 56)
    ok = True
    for name, val in report:
        print(f'  {name:42s} {val:.6f}')
        if 'MAE' in name and val > gate:
            ok = False
    print('-' * 56)
    print('GATE (MAE ≤ 1e-2):', 'PASS' if ok else 'FAIL')
    return 0 if ok else 1


if __name__ == '__main__':
    raise SystemExit(main())
