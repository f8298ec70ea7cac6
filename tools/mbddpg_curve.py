"""Extract MBDDPG real-env collection curves from driver logs.

The torch reference's mbddpg example reports per-episode real returns only
through apply_controller's "Value of run [x]" prints (and tensorboard);
this framework's `examples/mbddpg.py` prints `episode N: ... real_return=x`
lines. Both parse into the same JSON curve for RESULTS.md.

Usage::

    python tools/mbddpg_curve.py runs/ref_mbddpg_s1.log --out results/curves_ref_mbddpg_s1.json
"""
import argparse
import json
import re


def parse(path):
    ref = re.compile(r'Value of run \[([-0-9.]+)\]')
    tpu = re.compile(r'episode (\d+):.*real_return=([-0-9.]+)')
    returns = []
    for line in open(path, errors='replace'):
        m = ref.search(line)
        if m:
            returns.append(float(m.group(1)))
            continue
        m = tpu.search(line)
        if m:
            returns.append(float(m.group(2)))
    return returns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('log')
    ap.add_argument('--out', required=True)
    ap.add_argument('--skip', type=int, default=0,
                    help='drop the first N entries (random warmup episodes)')
    args = ap.parse_args()
    r = parse(args.log)[args.skip:]
    best = max(r) if r else None
    with open(args.out, 'w') as f:
        json.dump(dict(log=args.log, skip=args.skip, n=len(r),
                       best_collected=best,
                       final5=(sum(r[-5:]) / len(r[-5:]) if r else None),
                       collection_returns=r), f, indent=1)
    print(f'{args.out}: n={len(r)} best={best}')


if __name__ == '__main__':
    main()
