"""Port reference zoo leaf configs into this repo via Config round-trip.

Each reference config file (`/root/reference/configs/**/*.py`) is pure data
(no imports / functions — verified by grep). We exec the file in isolation,
capture its top-level namespace (the leaf's own *delta*, NOT the merged
config — `_base_` inheritance structure is preserved verbatim), and re-render
it as pprint data. This is the same semantic-1:1 port used for the `_base_`
fragments in round 1: the merged Config must be identical to loading the
reference file directly (validated by ``--check`` and
``tests/test_config_zoo.py``).

Also copies the per-family ``.yml`` model-index metadata (pure benchmark
tables referenced by ``model-index.yml``).

Usage:
    python tools/port_reference_configs.py [--check] [--ref DIR] [--out DIR]
"""
from __future__ import annotations

import argparse
import pprint
import shutil
from pathlib import Path


def render_config(src: Path, rel: Path) -> str:
    ns: dict = {}
    code = compile(src.read_text(), str(src), 'exec')
    exec(code, ns)  # noqa: S102 — trusted local data files
    lines = [
        f'# Ported from the reference zoo (configs/{rel.as_posix()}) via '
        'Config round-trip;',
        '# semantic 1:1 data port so reference configs keep working.',
    ]
    for key, value in ns.items():
        if key.startswith('__'):
            continue
        lines.append(f'{key} = {pprint.pformat(value, sort_dicts=False)}')
    return '\n'.join(lines) + '\n'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ref', default='/root/reference/configs')
    ap.add_argument('--out',
                    default=str(Path(__file__).resolve().parent.parent /
                                'configs'))
    ap.add_argument('--check', action='store_true',
                    help='verify merged-config equality vs the reference '
                         'for every leaf (slow)')
    ap.add_argument('--force', action='store_true',
                    help='regenerate files that already exist')
    args = ap.parse_args()
    ref, out = Path(args.ref), Path(args.out)

    written = skipped = 0
    for src in sorted(ref.rglob('*.py')):
        rel = src.relative_to(ref)
        dst = out / rel
        if dst.exists() and not args.force:
            skipped += 1
            continue
        dst.parent.mkdir(parents=True, exist_ok=True)
        dst.write_text(render_config(src, rel))
        written += 1
    yml = 0
    for src in sorted(ref.rglob('*.yml')):
        dst = out / src.relative_to(ref)
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(src, dst)
        yml += 1
    print(f'ported {written} configs ({skipped} already present), '
          f'{yml} .yml metadata files')

    if args.check:
        import numpy as np  # noqa: F401
        from stc_unet_tpu.utils import Config
        bad = []
        leafs = [p for p in sorted(ref.rglob('*.py'))
                 if p.parts[-2] != '_base_' and '_base_' not in p.parts]
        for i, src in enumerate(leafs):
            rel = src.relative_to(ref)
            ca = Config.fromfile(str(src))
            cb = Config.fromfile(str(out / rel))
            da = {k: ca[k] for k in sorted(ca.keys())}
            db = {k: cb[k] for k in sorted(cb.keys())}
            if repr(da) != repr(db):
                bad.append(str(rel))
            if (i + 1) % 100 == 0:
                print(f'checked {i + 1}/{len(leafs)}')
        if bad:
            raise SystemExit('MISMATCH in: ' + '\n'.join(bad))
        print(f'all {len(leafs)} leaf configs merge identically')


if __name__ == '__main__':
    main()
