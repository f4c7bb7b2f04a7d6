"""Every registered query must match its DuckDB oracle exactly at sf0.001
(the driver runs the same comparison at sf0.01)."""

import pytest

from osm_processing_pipeline_spark import registry
from tests.conftest import SF_SMOKE
from tests.util import assert_frames_exact


@pytest.mark.parametrize("name", sorted(registry.ORACLES.keys()))
def test_query_matches_oracle(name, spark, duck_smoke):
    sp = registry.QUERIES[name](spark, SF_SMOKE).toPandas()
    du = duck_smoke.execute(registry.ORACLES[name]).df()
    assert len(sp) > 0, f"{name}: empty result"
    assert_frames_exact(sp, du, name)
