'''Native (C++) IO runtime vs the numpy path: identical batches.'''
import numpy as np
import pytest

from bmt_tpu.data.native import batch_load, native_available, npy_shape


@pytest.fixture(scope='module')
def npy_files(tmp_path_factory):
    root = tmp_path_factory.mktemp('npy')
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i, (S, D) in enumerate([(14, 16), (36, 16), (7, 16)]):
        arr = rng.normal(size=(S, D)).astype(np.float32)
        p = str(root / f'feat{i}.npy')
        np.save(p, arr)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


def test_native_builds():
    assert native_available(), 'libbmt_io.so failed to build/load'


def test_npy_shape(npy_files):
    paths, arrays = npy_files
    for p, a in zip(paths, arrays):
        assert npy_shape(p) == a.shape


def test_batch_load_native_matches_numpy(npy_files):
    paths, arrays = npy_files
    starts = [1.0, 0.0, 2.0]
    ends = [5.0, 10.0, 2.0]       # third is degenerate after crop? no: 2..2
    durations = [10.0, 10.0, 10.0]
    full = [0, 1, 0]
    for use_native in (True, False):
        if use_native and not native_available():
            pytest.skip('native lib unavailable')
        out, status = batch_load(paths, starts, ends, durations, full,
                                 pad_value=1.0, out_len=40, cols=16,
                                 use_native=use_native)
        if use_native:
            native_out, native_status = out, status
    np.testing.assert_allclose(native_out, out, atol=0)
    np.testing.assert_array_equal(native_status, status)

    # semantic spot checks vs reference crop rules
    # item 0: crop [1,5]/10 of 14 rows -> rows [1: 7)
    np.testing.assert_allclose(out[0, :6], arrays[0][1:7])
    assert np.all(out[0, 6:] == 1.0)
    # item 1: full 36 rows then pad
    np.testing.assert_allclose(out[1, :36], arrays[1])
    assert np.all(out[1, 36:] == 1.0)
    # item 2: degenerate crop [2,2] -> 1-frame fallback, row idx 1
    np.testing.assert_allclose(out[2, 0], arrays[2][1])


def test_batch_load_missing_file(tmp_path):
    out, status = batch_load([str(tmp_path / 'nope.npy')], [0.0], [1.0],
                             [2.0], [0], pad_value=1.0, out_len=4, cols=8)
    assert status[0] == 1
    np.testing.assert_allclose(out[0, 0], np.zeros(8))
    assert np.all(out[0, 1:] == 1.0)


@pytest.mark.skipif(not native_available(), reason='no native lib')
def test_native_throughput_sanity(npy_files):
    '''Native path should load a large batch without error (smoke perf).'''
    paths, arrays = npy_files
    all_paths = paths * 86  # 258 items
    B = len(all_paths)
    out, status = batch_load(all_paths, [0.0] * B, [10.0] * B, [10.0] * B,
                             [1] * B, 1.0, 40, 16)
    assert out.shape[0] == B
    assert np.all(status == 0)


@pytest.mark.skipif(not native_available(), reason='no native lib')
def test_native_rejects_truncated_and_3d_npy(tmp_path):
    '''Corrupt .npy files must take the clean zero-fill path, not read past
    the mapping; 3-D stacks must not be silently misparsed as 2-D.'''
    # truncated file: header promises 64x16 f4 but data is cut short
    good = np.random.default_rng(0).normal(size=(64, 16)).astype(np.float32)
    p_trunc = tmp_path / 'trunc.npy'
    np.save(p_trunc, good)
    raw = p_trunc.read_bytes()
    p_trunc.write_bytes(raw[:len(raw) // 2])
    # 3-D file
    p_3d = tmp_path / 'cube.npy'
    np.save(p_3d, np.zeros((8, 1, 16), np.float32))

    out, status = batch_load([str(p_trunc), str(p_3d)], [0.0] * 2,
                             [1.0] * 2, [2.0] * 2, [1, 1],
                             pad_value=1.0, out_len=4, cols=16)
    assert status.tolist() == [1, 1]          # both zero-filled as missing
    np.testing.assert_allclose(out[:, 0], np.zeros((2, 16)))


def _both_backends(paths, starts, ends, durations, full, out_len=16,
                   cols=16, pad=7.0):
    outs = {}
    for use_native in (True, False):
        if use_native and not native_available():
            pytest.skip('native lib unavailable')
        outs[use_native] = batch_load(paths, starts, ends, durations, full,
                                      pad, out_len, cols,
                                      use_native=use_native)
    return outs


def test_negative_start_parity(npy_files):
    '''Negative proportional indices follow PYTHON slice semantics on both
    backends (the reference crops with feature[s:e], so negatives wrap
    from the end): a small negative start wraps to the array tail and an
    inverted wrapped range zero-fills — identically native and numpy.'''
    paths, arrays = npy_files
    cases = [
        (-3.0, -1.0, 10.0),   # wraps: rows from the tail, status 0
        (-0.5, 2.0, 10.0),    # wrapped start > end -> empty -> status 1
    ]
    for s, e, d in cases:
        outs = _both_backends([paths[0]], [s], [e], [d], [0])
        (o_n, st_n), (o_f, st_f) = outs[True], outs[False]
        np.testing.assert_array_equal(st_n, st_f)
        np.testing.assert_array_equal(o_n, o_f)


def test_zero_duration_parity(npy_files):
    '''duration == 0 (corrupt metadata) zero-fills with status 1 on both
    backends — Python raises ZeroDivisionError into the fallback's except
    path; the native crop_range guards the division explicitly (the
    int64 cast of inf would otherwise be UB).'''
    paths, _ = npy_files
    outs = _both_backends([paths[0]], [1.0], [5.0], [0.0], [0])
    for use_native, (out, status) in outs.items():
        assert status[0] == 1, use_native
        np.testing.assert_array_equal(out[0, 0], 0.0)
        np.testing.assert_array_equal(out[0, 1:], 7.0)


def test_empty_stack_full_load_parity(tmp_path):
    '''A (0, D) feature stack on the FULL-load path zero-fills with
    status 1 on both backends (status drives the paired rgb/flow
    zero-fill in the dataset).'''
    p = str(tmp_path / 'empty.npy')
    np.save(p, np.zeros((0, 16), np.float32))
    outs = _both_backends([p], [0.0], [1.0], [10.0], [1])
    for use_native, (out, status) in outs.items():
        assert status[0] == 1, use_native
        np.testing.assert_array_equal(out[0, 0], 0.0)
        np.testing.assert_array_equal(out[0, 1:], 7.0)


def test_overflow_shape_header_rejected(tmp_path):
    '''A crafted npy header whose declared shape product overflows uint64
    must be rejected as unreadable (zero-fill, status 1) — not pass the
    bounds check and read past the mapping (SIGBUS).'''
    p = str(tmp_path / 'evil.npy')
    # shape (2^62, 2) float32: 2^62 * 2 * 4 == 2^65 wraps to 0 mod 2^64
    header = ("{'descr': '<f4', 'fortran_order': False, "
              "'shape': (4611686018427387904, 2), }")
    header = header + ' ' * ((64 - (10 + len(header) + 1) % 64) % 64) + '\n'
    with open(p, 'wb') as f:
        f.write(b'\x93NUMPY\x01\x00')
        f.write(len(header).to_bytes(2, 'little'))
        f.write(header.encode())
        f.write(b'\x00' * 32)          # tiny payload, nowhere near 2^65

    if native_available():
        with pytest.raises(FileNotFoundError):
            npy_shape(p)
    out, status = batch_load([p], [0.0], [1.0], [10.0], [1], 7.0, 8, 2)
    assert status[0] == 1
    np.testing.assert_array_equal(out[0, 0], 0.0)
