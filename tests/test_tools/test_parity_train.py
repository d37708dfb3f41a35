"""CLI test for the training-dynamics parity tool (tools/parity_train.py).

≙ the reference's torch-oracle numerical tests (SURVEY.md §4 golden
tests); the full-width run that produces PARITY_TRAIN.json is executed
out-of-suite (see tool docstring) — here the tiny width keeps CPU cost
down while exercising the identical code path end-to-end.
"""
import json
import runpy
import sys


def test_parity_train_tiny(tmp_path, monkeypatch):
    out = tmp_path / 'parity.json'
    monkeypatch.setattr(sys, 'argv', [
        'parity_train.py', '--width', 'tiny', '--size', '32', '--batch', '2',
        '--steps', '3', '--lr', '1e-4', '--out', str(out),
        '--platform', ''])
    runpy.run_path('tools/parity_train.py', run_name='__main__')
    res = json.loads(out.read_text())
    assert res['parity_rtol_1e3'] is True
    assert res['max_step_rel_delta'] <= 1e-3
