"""Digest a jax.profiler chrome trace into a per-source device-time table.

Usage::

    python tools/profile_digest.py runs/profile_headline > results/profile_digest.md

Aggregates the TPU device track's op durations by the `source` attribution
XLA carries through lowering (file:line of the op's origin). This is the
table BASELINE.md's "where the time goes" section is generated from.
"""
import collections
import glob
import gzip
import json
import sys


def main(trace_dir):
    paths = sorted(glob.glob(
        f'{trace_dir}/plugins/profile/*/[!.]*trace.json.gz'))
    if not paths:
        raise SystemExit(f'no trace.json.gz under {trace_dir}')
    path = paths[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    names = {p.get('pid'): p.get('args', {}).get('name')
             for p in t['traceEvents']
             if p.get('ph') == 'M' and p.get('name') == 'process_name'}
    dev_pids = {p for p, n in names.items() if n and 'TPU' in n}
    src = collections.Counter()
    total = 0
    for e in t['traceEvents']:
        if e.get('ph') != 'X' or 'dur' not in e or e['pid'] not in dev_pids:
            continue
        n = e['name']
        if n.startswith(('while', 'jit_', '2', '3')):
            continue  # container events that nest the leaf ops
        src[e.get('args', {}).get('source', 'unknown')] += e['dur']
        total += e['dur']
    print(f'# Device-time by source — {path}\n')
    print(f'Total leaf-op busy time: {total / 1e3:.1f} ms\n')
    print('| source | device ms | share |')
    print('|---|---|---|')
    for s, d in src.most_common(25):
        print(f'| {s} | {d / 1e3:.2f} | {100 * d / total:.1f}% |')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'runs/profile_headline')
