'''Golden parity: make_metafile reproduces the reference's shipped meta CSVs
byte-for-byte from the raw ActivityNet JSONs (caption cleanup regexes, float
formatting, CSV quoting, md5 gate).'''
import os

import pytest

from bmt_tpu.utils.misc import make_metafile, md5sum

REF_DATA = '/root/reference/data'


@pytest.mark.skipif(not os.path.exists(REF_DATA),
                    reason='reference mount not available')
@pytest.mark.parametrize('split', ['train', 'val_1', 'val_2'])
def test_make_metafile_bit_identical(split, tmp_path):
    out = str(tmp_path / f'{split}.csv')
    make_metafile(f'{REF_DATA}/available_mp4.txt',
                  f'{REF_DATA}/{split}.json', out)
    with open(out) as f_mine, open(f'{REF_DATA}/{split}.csv') as f_ref:
        assert f_mine.read() == f_ref.read()


@pytest.mark.skipif(not os.path.exists(REF_DATA),
                    reason='reference mount not available')
def test_make_metafile_md5_gate(tmp_path):
    bad = tmp_path / 'available_mp4.txt'
    bad.write_text('v_fake.mp4\n')
    with pytest.raises(Exception, match='hash does not match'):
        make_metafile(str(bad), f'{REF_DATA}/train.json',
                      str(tmp_path / 'out.csv'))


@pytest.mark.skipif(not os.path.exists(REF_DATA),
                    reason='reference mount not available')
def test_ensure_meta_assets_regenerates_family(tmp_path):
    '''Given only the annotation JSONs + available_mp4.txt, the asset
    generator rebuilds the val CSV byte-identically and the no_missings
    reference JSON content-identically to the reference's shipped files.'''
    import json
    import shutil

    from bmt_tpu.data.assets import ensure_meta_assets, ensure_meta_file

    for name in ('available_mp4.txt', 'val_1.json'):
        shutil.copy(f'{REF_DATA}/{name}', tmp_path / name)

    # trigger via the missing-file hook the datasets use
    ensure_meta_file(str(tmp_path / 'val_1.csv'))

    with open(tmp_path / 'val_1.csv') as f_mine, \
            open(f'{REF_DATA}/val_1.csv') as f_ref:
        assert f_mine.read() == f_ref.read()

    with open(tmp_path / 'val_1_no_missings.json') as f_mine, \
            open(f'{REF_DATA}/val_1_no_missings.json') as f_ref:
        assert json.load(f_mine) == json.load(f_ref)

    # idempotent: nothing regenerated on a second call
    assert ensure_meta_assets(str(tmp_path)) == []
