import os

import pytest
import ray
from ray.data import DataContext


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


def assert_tables_equal(a, b, sort_by=None):
    """Data-wise table equality (ignores schema nullability metadata)."""
    import pyarrow as pa

    assert a.num_rows == b.num_rows, (a.num_rows, b.num_rows)
    assert set(a.column_names) == set(b.column_names), (
        a.column_names,
        b.column_names,
    )
    if sort_by:
        a = a.sort_by([(sort_by, "ascending")])
        b = b.sort_by([(sort_by, "ascending")])
    for name in a.column_names:
        ca, cb = a[name].combine_chunks(), b[name].combine_chunks()
        if ca.type != cb.type:
            import pyarrow.compute as pc

            cb = pc.cast(cb, ca.type)
        assert ca.equals(cb), f"column {name} differs"
