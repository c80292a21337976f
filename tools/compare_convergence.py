#!/usr/bin/env python
"""Matched-step convergence comparison between two training runs.

Reads the JSONL metric streams two ``train_conditional_v2.py`` runs wrote
(``PAINTMIND_JSONL_LOG=1`` → ``<log-dir>/paintmind/metrics.jsonl``) and
prints masked-CE loss at matched steps plus the routing-health columns of
the MoE run (lb loss, router z, dropped fraction, expert-load min/max).
Both runs must share the recipe (data, batch, LR schedule) for the
comparison to mean anything — the dense run's curve is the baseline the
MoE variant has to beat at equal step budget (VERDICT r3 #2).

Usage:
  python tools/compare_convergence.py log/dense_r4/paintmind/metrics.jsonl \
      log/moe_r4/paintmind/metrics.jsonl [--window 500]
"""

import argparse
import json


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            rows[int(r['step'])] = r
    return rows


def smoothed(rows, step, window):
    """Mean loss over [step - window, step] — single-batch loss is noisy."""
    vals = [r['loss'] for s, r in rows.items() if step - window < s <= step]
    return sum(vals) / len(vals) if vals else None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('baseline')
    ap.add_argument('candidate')
    ap.add_argument('--window', type=int, default=500,
                    help='smoothing window (steps) for the loss columns')
    ap.add_argument('--points', type=int, default=8,
                    help='number of matched steps to report')
    args = ap.parse_args()

    base = load(args.baseline)
    cand = load(args.candidate)
    last = max(cand)  # candidate is the shorter run
    logged = sorted(set(base) | set(cand))
    # snap each gridpoint to the nearest logged step at or below it — the
    # metric cadence (log_every) rarely divides the grid spacing
    grid = range(0, last + 1, max(last // args.points, 1))
    steps = sorted({max((s for s in logged if s <= g), default=None)
                    for g in grid} - {None} | {last})

    print(f'{"step":>7} {"base loss":>10} {"cand loss":>10} {"Δ":>8}'
          f' {"lb loss":>8} {"dropped":>8} {"load min/max":>14}')
    for s in steps:
        b = smoothed(base, s, args.window)
        c = smoothed(cand, s, args.window)
        prev = max((k for k in cand if k <= s), default=None)
        row = cand.get(s) or (cand.get(prev, {}) if prev is not None else {})
        d = f'{c - b:+.3f}' if (b is not None and c is not None) else '-'
        lb = row.get('lb loss')
        dr = row.get('dropped')
        lo, hi = row.get('expert load min'), row.get('expert load max')
        print(f'{s:>7} '
              f'{b if b is not None else float("nan"):>10.4f} '
              f'{c if c is not None else float("nan"):>10.4f} {d:>8} '
              f'{lb if lb is not None else float("nan"):>8.4f} '
              f'{dr if dr is not None else float("nan"):>8.4f} '
              + (f'{lo:>6.3f}/{hi:<6.3f}' if lo is not None else
                 f'{"-":>14}'))

    b = smoothed(base, last, args.window)
    c = smoothed(cand, last, args.window)
    if b is not None and c is not None:
        verdict = 'ahead of' if c < b else 'behind'
        print(f'\nAt step {last} (±{args.window}-step mean): candidate '
              f'{c:.4f} vs baseline {b:.4f} — candidate is {verdict} the '
              f'dense baseline by {abs(c - b):.4f} nats.')


if __name__ == '__main__':
    main()
