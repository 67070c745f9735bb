"""Tests for config/log/timing/io — parity with wave_utils tests
(wave_utils/tests/utils/config_test.cpp, data_test.cpp)."""

import dataclasses

import numpy as np
import pytest

from libwave_tpu.utils import (
    ConfigError,
    config_field,
    csv2mat,
    csvcols,
    csvrows,
    load_config,
    mat2csv,
    matrix_from_string,
    tic,
    toc,
)
from libwave_tpu.utils.config import from_dict


@dataclasses.dataclass(frozen=True)
class DemoParams:
    bool_val: bool = False
    int_val: int = 0
    float_val: float = 0.0
    string_val: str = ""
    vector: np.ndarray = config_field(None)
    matrix: np.ndarray = config_field(None)
    required_key: int = config_field(7, required=False)


@dataclasses.dataclass(frozen=True)
class ValidatedParams:
    threshold: int = 10

    def validate(self):
        if self.threshold < 0:
            raise ConfigError("threshold must be >= 0")


YAML_FIXTURE = """
config:
  bool_val: true
  int_val: 3
  float_val: 2.5
  string_val: hello
  vector: [1.0, 2.0, 3.0]
  matrix:
    rows: 2
    cols: 2
    data: [1.0, 2.0, 3.0, 4.0]
"""


class TestConfig:
    def test_load(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text(YAML_FIXTURE)
        cfg = load_config(DemoParams, str(p), prefix="config")
        assert cfg.bool_val is True
        assert cfg.int_val == 3
        assert cfg.float_val == 2.5
        assert cfg.string_val == "hello"
        np.testing.assert_allclose(cfg.vector, [1.0, 2.0, 3.0])
        np.testing.assert_allclose(cfg.matrix, [[1.0, 2.0], [3.0, 4.0]])
        assert cfg.required_key == 7  # optional, default kept

    def test_missing_file(self):
        with pytest.raises(ConfigError):
            load_config(DemoParams, "/nonexistent/path.yaml")

    def test_missing_required(self):
        @dataclasses.dataclass
        class Req:
            must: int = config_field(0, required=True)

        with pytest.raises(ConfigError, match="must"):
            from_dict(Req, {})

    def test_type_mismatch(self):
        with pytest.raises(ConfigError):
            from_dict(DemoParams, {"int_val": "nope"})

    def test_bad_matrix(self):
        with pytest.raises(ConfigError):
            from_dict(
                DemoParams, {"matrix": {"rows": 2, "cols": 2, "data": [1.0]}}
            )

    def test_validate_on_construct(self):
        with pytest.raises(ConfigError):
            from_dict(ValidatedParams, {"threshold": -1})
        assert from_dict(ValidatedParams, {"threshold": 5}).threshold == 5

    def test_dotted_keys(self):
        @dataclasses.dataclass
        class Nested:
            value: float = 0.0

        cfg = from_dict(Nested, {"a": {"b": {"value": 1.5}}}, prefix="a.b")
        assert cfg.value == 1.5


class TestIO:
    def test_csv_roundtrip(self, tmp_path, rng):
        m = rng.normal(size=(5, 3))
        p = tmp_path / "m.csv"
        mat2csv(str(p), m)
        assert csvrows(str(p)) == 5
        assert csvcols(str(p)) == 3
        np.testing.assert_allclose(csv2mat(str(p)), m)

    def test_matrix_from_string(self):
        m = matrix_from_string("1 2 3\n4 5 6\n")
        np.testing.assert_allclose(m, [[1, 2, 3], [4, 5, 6]])


class TestTiming:
    def test_tic_toc(self):
        t = tic()
        assert toc(t) >= 0.0
