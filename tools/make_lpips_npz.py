"""One-time LPIPS weight conversion (run where the `lpips` package and its
pretrained VGG16 weights are available — this build environment has neither,
see BASELINE.md).

    pip install lpips  # pulls torchvision VGG16 + the lpips linear heads
    python tools/make_lpips_npz.py --out paintmind_tpu/assets/lpips_vgg.npz

The output npz drops straight into VQGANTrainer(perceptual_weights='auto'),
restoring exact reference-parity stage-1 perceptual loss
(reference paintmind/utils/trainer.py:108-110). Also writes golden
activations (fixed inputs → torch lpips distances) next to the npz so
tests/test_training.py's gated golden test can verify value parity.
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--out', default='paintmind_tpu/assets/lpips_vgg.npz')
    ap.add_argument('--golden', default='paintmind_tpu/assets/lpips_golden.npz')
    args = ap.parse_args()

    import numpy as np
    import torch
    import lpips as lpips_pkg

    from paintmind_tpu.models.lpips import convert_lpips
    from paintmind_tpu.utils.checkpoint import save_params

    torch_lpips = lpips_pkg.LPIPS(net='vgg').eval()
    params = convert_lpips(torch_lpips)
    save_params(args.out, params)
    print(f'wrote {args.out}')

    # golden pairs for the gated parity test
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        d = torch_lpips(torch.tensor(x.transpose(0, 3, 1, 2)),
                        torch.tensor(y.transpose(0, 3, 1, 2)))
    np.savez(args.golden, x=x, y=y,
             dist=np.asarray(d.reshape(-1).numpy(), np.float32))
    print(f'wrote {args.golden}')


if __name__ == '__main__':
    main()
