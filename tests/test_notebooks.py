"""Notebook counterparts (`/root/reference/notebooks/*.ipynb`): structural
validity, syntax, and (for the self-contained ones) tiny-config execution."""
import json
import os
import re

import pytest

import matplotlib
matplotlib.use('Agg')

NB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'notebooks')
NOTEBOOKS = ('mc_pilco.ipynb', 'BNN_regression_example.ipynb',
             'run_trained_policy.ipynb')


def load(name):
    with open(os.path.join(NB_DIR, name)) as fh:
        return json.load(fh)


@pytest.mark.parametrize('name', NOTEBOOKS)
def test_structure_and_syntax(name):
    nb = load(name)
    assert nb['nbformat'] == 4
    kinds = {c['cell_type'] for c in nb['cells']}
    assert kinds <= {'markdown', 'code'} and 'code' in kinds
    for i, cell in enumerate(nb['cells']):
        src = ''.join(cell['source'])
        if cell['cell_type'] == 'code':
            compile(src, f'{name}:cell{i}', 'exec')  # SyntaxError = failure
        else:
            assert src.strip()


def _run_cells(nb, shrink):
    import matplotlib.pyplot as plt
    ns = {'__name__': '__nb__'}
    plt_show = plt.show
    plt.show = lambda *a, **k: None
    try:
        for cell in nb['cells']:
            if cell['cell_type'] != 'code':
                continue
            src = ''.join(cell['source'])
            for pat, rep in shrink.items():
                src = re.sub(pat, rep, src)
            exec(compile(src, '<nb>', 'exec'), ns)
    finally:
        plt.show = plt_show
        plt.close('all')
    return ns


def test_mc_pilco_notebook_executes_tiny():
    ns = _run_cells(load('mc_pilco.ipynb'), {
        r'PS_ITERS = \d+': 'PS_ITERS = 1',
        r'PRED_H = \d+': 'PRED_H = 4',
        r'CONTROL_H = \d+': 'CONTROL_H = 8',
        r'POL_OPT_ITERS = \d+': 'POL_OPT_ITERS = 5',
        r'DYN_OPT_ITERS = \d+': 'DYN_OPT_ITERS = 10',
        r'N_PARTICLES = \d+': 'N_PARTICLES = 10',
        r'\(200, 200\)': '(16, 16)',
    })
    assert len(ns['returns']) == 1
    import numpy as np
    assert np.isfinite(ns['returns'][0])


def test_bnn_notebook_executes_tiny():
    ns = _run_cells(load('BNN_regression_example.ipynb'), {
        r'iters=4000': 'iters=40',
        r'\(200, 200, 200, 200\)': '(24, 24)',
        r'\(64, 64\)': '(16, 16)',
        r'K = 8': 'K = 2',
        r'PRNGKey\(2\), 50\)': 'PRNGKey(2), 5)',
        r'PRNGKey\(5\), 3000\)': 'PRNGKey(5), 40)',
    })
    import numpy as np
    assert np.asarray(ns['samples']).ndim == 3
    assert np.all(np.isfinite(np.asarray(ns['mu'])))
