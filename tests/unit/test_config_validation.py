"""SGDConfig free-string validation: typos must raise at construction,
not silently select a fallback path (ADVICE round 2: sgd.mxu='bfloat16'
silently ran the f32 path)."""

import pytest

from mfx.config import SGDConfig, apply_overrides, preset


@pytest.mark.parametrize(
    "field,bad",
    [
        ("mxu", "bfloat16"),
        ("mxu", "BF16"),
        ("plan_device", "Device"),
        ("kernel", "palas"),
        ("partitioner", "block"),
    ],
)
def test_bad_enum_value_raises(field, bad):
    with pytest.raises(ValueError, match=field):
        SGDConfig(**{field: bad})


def test_bad_value_via_override_raises():
    with pytest.raises(ValueError, match="mxu"):
        apply_overrides(preset("ml25m_rank64"), ["sgd.mxu=bfloat16"])


def test_good_values_pass():
    SGDConfig(mxu="bf16", plan_device="device", kernel="pallas",
              partitioner="blocked")
    SGDConfig()  # defaults
