"""Sign characterizer tests (reference utils/sign_characterizer.cpp:60-245)."""

import json

import numpy as np
import pytest

from sorting_fhe_tpu.characterize import (characterize_function, parse_func,
                                          generate_header, _build_context)
from sorting_fhe_tpu.ops.sign import SignFunc, SignConfig, CompositeSignConfig


@pytest.fixture(scope="module")
def ctx():
    return _build_context()


def test_characterize_composite3(ctx):
    m = characterize_function(
        ctx, SignFunc.CompositeSign, SignConfig(CompositeSignConfig(3, 2, 2)),
        max_decades=4)
    # CompositeSign(3,2,2) resolves 0.1-scale inputs and consumes 12 levels
    # (4 polys x 3); its working precision is a positive power of ten
    assert m.depth == 12
    assert 0 < m.working_precision <= 1.0
    assert m.execution_time_ms > 0


def test_deeper_config_has_finer_precision(ctx):
    shallow = characterize_function(
        ctx, SignFunc.CompositeSign, SignConfig(CompositeSignConfig(3, 1, 1)),
        max_decades=4)
    deep = characterize_function(
        ctx, SignFunc.CompositeSign, SignConfig(CompositeSignConfig(3, 3, 2)),
        max_decades=4)
    assert deep.working_precision <= shallow.working_precision
    assert deep.depth > shallow.depth


def test_parse_func():
    f, cfg = parse_func("CompositeSign_2_3")
    assert f == SignFunc.CompositeSign
    assert (cfg.compos.n, cfg.compos.dg, cfg.compos.df) == (4, 2, 3)
    f, cfg = parse_func("CompositeSign3_3_2")
    assert (cfg.compos.n, cfg.compos.dg, cfg.compos.df) == (3, 3, 2)
    assert parse_func("NaiveDiscrete")[0] == SignFunc.NaiveDiscrete
    with pytest.raises(ValueError):
        parse_func("Bogus")


def test_generate_header(tmp_path, monkeypatch):
    """Header + JSON in the reference's X-macro format
    (sign_characterizer.cpp:138-166), on a trimmed sweep."""
    import sorting_fhe_tpu.characterize as C
    monkeypatch.setattr(C, "SWEEP", C.SWEEP[2:3])   # CompositeSign3_2_2 only
    path = tmp_path / "sign_function_metrics.h"
    results = C.generate_header(str(path))
    text = path.read_text()
    assert "#ifdef GET_SIGN_FUNCTION_METRIC" in text
    assert "GET_SIGN_FUNCTION_METRIC(CompositeSign3_2_2, 12," in text
    data = json.loads((tmp_path / "sign_function_metrics.json").read_text())
    assert data["CompositeSign3_2_2"]["depth"] == 12
    assert results["CompositeSign3_2_2"]["working_precision"] <= 1.0
