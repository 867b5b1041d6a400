"""Native C++ parser: builds via g++, matches the numpy fallback
bit-for-bit, and wins on speed."""

import time

import numpy as np
import pytest

from fixtures import make_svmlight


@pytest.fixture(scope="module")
def native():
    try:
        from lr2ppo_tpu import native as n

        n._load()
        return n
    except Exception as e:  # no g++ etc.
        pytest.skip(f"native build unavailable: {e}")


def _numpy_parse(path, num_features):
    import lr2ppo_tpu.data.letor as letor

    rows = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            label = float(parts[0])
            qid = float(parts[1].split(":")[1])
            feats = np.zeros(num_features, dtype=np.float32)
            for tok in parts[2:]:
                if tok.startswith("#"):
                    break
                k, v = tok.split(":")
                feats[int(k) - 1] = float(v)
            rows.append(np.concatenate([[label, qid], feats]))
    arr = np.asarray(rows, dtype=np.float32)
    return arr[np.argsort(arr[:, 1], kind="stable")]


def test_svmlight_parity(native, tmp_path):
    p = tmp_path / "d.svm"
    make_svmlight(str(p), n_rows=200, n_feat=12, n_qids=7, seed=3)
    got = native.parse_svmlight(str(p), 12)
    want = _numpy_parse(str(p), 12)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_svmlight_comments_and_blank_lines(native, tmp_path):
    p = tmp_path / "d.svm"
    p.write_text("2 qid:1 1:0.5 3:1.5 # a comment\n\n"
                 "0 qid:2 2:-1.25\n")
    got = native.parse_svmlight(str(p), 3)
    want = np.array([[2, 1, 0.5, 0, 1.5], [0, 2, 0, -1.25, 0]], np.float32)
    np.testing.assert_allclose(got, want)


def test_tsv_parse(native, tmp_path):
    p = tmp_path / "d.tsv"
    arr = np.arange(12, dtype=np.float32).reshape(3, 4) / 7
    np.savetxt(p, arr, delimiter="\t", fmt="%.6g")
    got = native.parse_tsv(str(p))
    np.testing.assert_allclose(got, arr, rtol=1e-5)


def test_letor_integration_uses_native(native, tmp_path):
    from lr2ppo_tpu.data.letor import parse_svmlight_file

    p = tmp_path / "d.svm"
    make_svmlight(str(p), n_rows=50, n_feat=8, n_qids=3)
    arr = parse_svmlight_file(str(p), 8)
    assert arr.shape == (50, 10)


def test_native_is_faster(native, tmp_path):
    p = tmp_path / "big.svm"
    make_svmlight(str(p), n_rows=20000, n_feat=64, n_qids=50, seed=1)
    # CPU time, best-of-3: wall clock is meaningless when the host is
    # shared with a concurrent TPU bench / full-suite run
    t_native = min(
        _timed(lambda: native.parse_svmlight(str(p), 64)) for _ in range(3))
    t_py = min(_timed(lambda: _numpy_parse(str(p), 64)) for _ in range(3))
    assert t_native < t_py  # typically 20-100x


def _timed(f):
    t0 = time.process_time()
    f()
    return time.process_time() - t0


def test_svmlight_dangling_value_fails_loudly(native, tmp_path):
    # 'idx:' with no value used to make strtod skip the newline and eat
    # the NEXT line's label as the feature value; the native path must
    # refuse (None) so the caller falls back to numpy, which raises
    p = tmp_path / "bad.svm"
    p.write_text("2 qid:1 5:\n1 qid:2 1:0.5\n")
    assert native.parse_svmlight(str(p), 8) is None
    from lr2ppo_tpu.data.letor import parse_svmlight_file

    with pytest.raises(ValueError):
        parse_svmlight_file(str(p), 8)


def test_svmlight_out_of_range_feature_fails_loudly(native, tmp_path):
    # wrong --num_features must not silently truncate features
    p = tmp_path / "wide.svm"
    p.write_text("2 qid:1 1:0.5 7:1.0\n")
    assert native.parse_svmlight(str(p), 3) is None
    from lr2ppo_tpu.data.letor import parse_svmlight_file

    with pytest.raises(IndexError):
        parse_svmlight_file(str(p), 3)


def test_parse_svmlight_file_native_opt_out(tmp_path):
    from fixtures import make_svmlight
    from lr2ppo_tpu.data.letor import parse_svmlight_file

    p = tmp_path / "d.svm"
    make_svmlight(str(p), n_rows=40, n_feat=6, n_qids=3, seed=1)
    a = parse_svmlight_file(str(p), 6, use_native=True)
    b = parse_svmlight_file(str(p), 6, use_native=False)
    np.testing.assert_allclose(a, b, rtol=1e-6)
