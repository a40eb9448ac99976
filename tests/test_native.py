"""Native C++ preprocessing library vs the scipy reference."""

import numpy as np
import pytest
from scipy.stats import norm, rankdata

from linearcorex_tpu.utils import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_ndtri_matches_scipy():
    p = np.linspace(1e-12, 1 - 1e-12, 10001)
    got = native.ndtri(p)
    want = norm.ppf(p)
    assert np.abs(got - want).max() < 1e-12


def test_empirical_gaussianize_matches_scipy():
    rng = np.random.RandomState(0)
    x = rng.lognormal(size=(500, 7))
    x[::13, 2] = x[0, 2]  # inject ties
    got = native.empirical_gaussianize(x)
    n = x.shape[0]
    want = np.empty_like(x)
    for j in range(x.shape[1]):
        want[:, j] = norm.ppf((rankdata(x[:, j]) - 0.5) / n)
    assert np.abs(got - want).max() < 1e-12


def test_mean_impute_matches_numpy():
    rng = np.random.RandomState(1)
    x = rng.normal(size=(200, 5))
    x[::7, 1] = -999.0
    x[:, 4] = -999.0  # fully missing column → zeros
    got = native.mean_impute(x, -999.0)
    ref = x.copy()
    for j in range(5):
        mask = ref[:, j] == -999.0
        obs = ref[~mask, j]
        ref[mask, j] = obs.mean() if obs.size else 0.0
    assert np.abs(got - ref).max() < 1e-12


def test_oracle_uses_native_consistently():
    """The oracle preprocessing (scipy path) and the native path agree, so
    either can feed the solver."""
    from linearcorex_tpu.oracle.oracle import _Preprocessor
    rng = np.random.RandomState(2)
    x = rng.lognormal(size=(300, 6))
    pre = _Preprocessor(gaussianize="empirical")
    want = pre.fit_transform(x)
    got = native.empirical_gaussianize(x)
    assert np.abs(got - want).max() < 1e-12


def test_corex_host_preprocess_matches_device():
    """Corex.fit with the native host gaussianize equals the device path."""
    import linearcorex_tpu as lc
    rng = np.random.RandomState(3)
    x = rng.lognormal(size=(400, 24))
    w0 = rng.normal(scale=1 / np.sqrt(24), size=(4, 24))
    c_host = lc.Corex(n_hidden=4, gaussianize="empirical",
                      dtype="float64").fit(x, init_ws=w0)  # native path
    import jax.numpy as jnp
    c_dev = lc.Corex(n_hidden=4, gaussianize="empirical",
                     dtype="float64").fit(jnp.asarray(x), init_ws=w0)
    # AS241 (native) vs jax ndtri differ at ~1e-9 per value; the fit
    # amplifies this slightly
    assert abs(c_host.tc - c_dev.tc) < 1e-5
    assert np.abs(np.asarray(c_host.ws) - np.asarray(c_dev.ws)).max() < 1e-3


def test_csv_reader_matches_loadtxt(tmp_path):
    """Native block reader reproduces np.loadtxt exactly, across block
    boundaries, headers, and nan cells."""
    from linearcorex_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(0)
    x = rng.normal(size=(257, 7))
    x[3, 2] = np.nan
    path = str(tmp_path / "d.csv")
    with open(path, "w") as f:
        f.write("c0,c1,c2,c3,c4,c5,c6\n")
        for row in x:
            f.write(",".join(f"{v:.17g}" for v in row) + "\n")
    blocks = list(native.CsvReader(path, block_rows=100, skip_header=1))
    got = np.concatenate(blocks)
    want = np.loadtxt(path, delimiter=",", skiprows=1)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want),
                               rtol=0, atol=0)


def test_csv_reader_errors(tmp_path):
    from linearcorex_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    import pytest
    with pytest.raises(FileNotFoundError):
        native.CsvReader(str(tmp_path / "missing.csv"))
    bad = str(tmp_path / "bad.csv")
    with open(bad, "w") as f:
        f.write("1.0,2.0\n3.0,oops\n")
    r = native.CsvReader(bad, block_rows=10)
    with pytest.raises(ValueError, match="unparsable"):
        list(r)


def test_fit_csv_matches_in_memory(tmp_path):
    """fit_csv == Corex.fit on the loaded array (both standard-gaussianize),
    and the pure-Python fallback produces the same blocks as native."""
    import linearcorex_tpu as lc
    from linearcorex_tpu.utils import native
    from tests.conftest import block_data
    x = block_data(n=500, p=24, m=3, seed=5)
    path = str(tmp_path / "x.tsv")
    np.savetxt(path, x, delimiter="\t")
    m = lc.fit_csv(path, n_hidden=3, block_rows=128, delimiter="\t",
                   seed=0, dtype="float64")
    ref = lc.GramAccumulator(24, dtype="float64").update(x).fit(
        n_hidden=3, seed=0)
    assert abs(m.tc - ref.tc) < 1e-8
    assert np.abs(np.asarray(m.ws) - np.asarray(ref.ws)).max() < 1e-8
    if native.available():
        # native blocks == the raw file contents, exactly
        nat = np.concatenate(list(native.CsvReader(path, 128,
                                                   delimiter="\t")))
        rows = []
        with open(path) as f:
            for line in f:
                rows.append([float(v) for v in line.split()])
        np.testing.assert_allclose(nat, np.array(rows), rtol=0, atol=0)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_loader_space_delimited(tmp_path):
    """Space-delimited files parse natively (regression: the post-value
    blank skip used to consume the ' ' delimiter itself) and runs of
    blanks count as one separator."""
    from linearcorex_tpu.utils.streaming import iter_text_blocks

    path = _write(tmp_path, "sp.txt", "1.0 2.0  3.0\n4.0 5.0 6.0\n")
    blocks = list(iter_text_blocks(path, delimiter=" "))
    x = np.vstack(blocks)
    assert x.shape == (2, 3)
    assert np.allclose(x, [[1, 2, 3], [4, 5, 6]])


def test_loader_blank_crlf_lines(tmp_path):
    """Blank lines — including CRLF-only ones — are skipped identically by
    the native reader and the Python fallback."""
    from linearcorex_tpu.utils.streaming import iter_text_blocks

    path = _write(tmp_path, "crlf.csv", "1,2\r\n\r\n3,4\r\n\n5,6\r\n")
    x = np.vstack(list(iter_text_blocks(path)))
    assert x.shape == (3, 2)
    assert np.allclose(x, [[1, 2], [3, 4], [5, 6]])


def test_loader_empty_field_rejected(tmp_path):
    """'1,,2' is silent data misalignment, not a value — both readers
    raise instead of dropping the field."""
    import pytest

    from linearcorex_tpu.utils.streaming import iter_text_blocks

    path = _write(tmp_path, "bad.csv", "1,2,3\n1,,2\n")
    with pytest.raises(ValueError):
        list(iter_text_blocks(path))


def test_loader_ragged_row_rejected(tmp_path):
    import pytest

    from linearcorex_tpu.utils.streaming import iter_text_blocks

    path = _write(tmp_path, "ragged.csv", "1,2,3\n1,2\n")
    with pytest.raises(ValueError):
        list(iter_text_blocks(path))


def test_loader_fallback_matches_native(tmp_path, monkeypatch):
    """The pure-Python fallback and the native reader produce identical
    output (and identical rejections) on the same files."""
    import pytest

    from linearcorex_tpu.utils import native
    from linearcorex_tpu.utils import streaming as S

    good = _write(tmp_path, "g.csv",
                  "+1, 2,3\r\n\r\n4,5 ,6e+1\n-inf,nan,1.5\n")
    spaced = _write(tmp_path, "g2.txt", "1 2  3\n4 5 6\n")
    bad = _write(tmp_path, "b.csv", "1,,2\n")
    trailing = _write(tmp_path, "t.csv", "1,2,\n")
    x_native = np.vstack(list(S.iter_text_blocks(good)))
    s_native = np.vstack(list(S.iter_text_blocks(spaced, delimiter=" ")))
    monkeypatch.setattr(native, "available", lambda: False)
    x_fb = np.vstack(list(S.iter_text_blocks(good)))
    s_fb = np.vstack(list(S.iter_text_blocks(spaced, delimiter=" ")))
    assert np.array_equal(x_native, x_fb, equal_nan=True)
    assert np.array_equal(s_native, s_fb, equal_nan=True)
    with pytest.raises(ValueError):
        list(S.iter_text_blocks(bad))
    with pytest.raises(ValueError):
        list(S.iter_text_blocks(trailing))
    monkeypatch.undo()
    if native.available():
        with pytest.raises(ValueError):
            list(S.iter_text_blocks(bad))
        with pytest.raises(ValueError):
            list(S.iter_text_blocks(trailing))


def test_loader_double_sign_rejected(tmp_path, monkeypatch):
    """"+-5" must be rejected by BOTH readers: pre-consuming the '+' must
    not let std::from_chars accept a second sign (the Python fallback's
    float("+-5") raises) — fallback-identical contract."""
    import pytest

    from linearcorex_tpu.utils import native
    from linearcorex_tpu.utils import streaming as S

    bad = _write(tmp_path, "ds.csv", "1,+-5,2\n")
    bad2 = _write(tmp_path, "ds2.csv", "1,++5,2\n")
    for path in (bad, bad2):
        if native.available():
            with pytest.raises(ValueError):
                list(S.iter_text_blocks(path))
        monkeypatch.setattr(native, "available", lambda: False)
        with pytest.raises(ValueError):
            list(S.iter_text_blocks(path))
        monkeypatch.undo()
