'''On-demand generation of the reference's meta assets.

The reference repo vendors its ActivityNet Captions metadata in `data/`
(reference: data/train.csv, data/val_{1,2}.csv, data/val_{1,2}_no_missings.json).
This repo does not vendor the large derived files; instead each is rebuilt
byte/content-identically the first time a dataset needs it:

- ``{phase}.csv`` — generated from ``{phase}.json`` + ``available_mp4.txt``
  via :func:`bmt_tpu.utils.misc.make_metafile`, a byte-identical
  reimplementation of the reference generator (reference:
  utilities/captioning_utils.py:54-124; golden-tested in
  tests/test_metafile.py).
- ``val_{1,2}_no_missings.json`` — the val annotation JSONs filtered to the
  ids in ``available_mp4.txt``; verified content-equal to the reference's
  shipped files (4483 of 4917 val_1 ids, 4453 of 4885 val_2 ids).

Source-file provenance (the two inputs that cannot be derived):

- ``{train,val_1,val_2}.json`` — the official ActivityNet Captions
  annotations, http://cs.stanford.edu/people/ranjaykrishna/densevid/
  captions.zip (vendored by the reference repo in data/).
- ``available_mp4.txt`` — the BMT authors' list of the 18,281 videos they
  could download; ``make_metafile`` md5-gates on it so a wrong copy fails
  loudly (reference: utilities/captioning_utils.py:55-64).
'''
from __future__ import annotations

import json
import os

from bmt_tpu.utils.misc import (AVAILABLE_MP4_FILE_HASH, make_metafile,
                                md5sum)


def ensure_meta_assets(data_dir: str, verbose: bool = True) -> list:
    '''Generate any missing meta CSVs / no_missings reference JSONs in
    ``data_dir`` from the annotation JSONs + available_mp4.txt.

    Missing *source* files are not an error — generation is skipped and the
    caller's normal file-not-found surfaces instead. Returns the list of
    files generated.

    Every file is written to a temp path and ``os.replace``d into place so
    concurrent processes (multi-host launches share the data dir) never
    observe a truncated file; the worst case is two ranks generating the
    same content. Both generators are gated on available_mp4.txt's md5
    (CSVs inside make_metafile, JSONs here) so a stale/partial available
    list fails loudly instead of producing wrong references.
    '''
    generated = []
    avail = os.path.join(data_dir, 'available_mp4.txt')
    if not os.path.exists(avail):
        return generated

    def _atomic(final_path, write_fn):
        tmp = f'{final_path}.tmp.{os.getpid()}'
        try:
            write_fn(tmp)
            os.replace(tmp, final_path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    for phase in ('train', 'val_1', 'val_2'):
        csv_path = os.path.join(data_dir, f'{phase}.csv')
        json_path = os.path.join(data_dir, f'{phase}.json')
        if not os.path.exists(csv_path) and os.path.exists(json_path):
            def write_csv(tmp, json_path=json_path):
                make_metafile(avail, json_path, tmp)
            _atomic(csv_path, write_csv)
            generated.append(csv_path)

    for phase in ('val_1', 'val_2'):
        nm_path = os.path.join(data_dir, f'{phase}_no_missings.json')
        json_path = os.path.join(data_dir, f'{phase}.json')
        if not os.path.exists(nm_path) and os.path.exists(json_path):
            if md5sum(avail) != AVAILABLE_MP4_FILE_HASH:
                raise Exception(
                    'available_mp4.txt hash does not match the expected')
            with open(avail) as f:
                available = {line.strip() for line in f}
            with open(json_path) as f:
                data = json.load(f)

            def write_json(tmp, data=data, available=available):
                with open(tmp, 'w') as f:
                    json.dump({k: v for k, v in data.items()
                               if k in available}, f)
            _atomic(nm_path, write_json)
            generated.append(nm_path)

    if verbose and generated:
        print(f'Generated meta assets: {generated}')
    return generated


def ensure_meta_file(path: str) -> None:
    '''If ``path`` (a meta CSV or reference JSON) is missing, try to build
    the whole asset family from the sources sitting next to it.'''
    if path and not os.path.exists(path):
        parent = os.path.dirname(os.path.abspath(path))
        ensure_meta_assets(parent)
