"""The public op namespace must stay complete and importable."""
import pytest

pytestmark = pytest.mark.fast


def test_ops_surface_complete():
    import dissc_tpu.ops as ops

    assert len(ops.__all__) >= 18
    for name in ops.__all__:
        assert callable(getattr(ops, name)), name
