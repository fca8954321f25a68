import pytest

# Initialize the full catalog FIRST: queries.py's tail imports every
# queries_sqlN in order, and several of those from-import helpers from
# earlier siblings. A test that imports a queries_sqlN submodule
# directly (before anything imported the catalog) would otherwise enter
# the cycle queries_sqlN -> queries -> queries_sqlM -> queries_sqlN
# (partially initialized) and die with ImportError.
import es_analytics_spark.queries  # noqa: F401  (import order, see above)
from es_analytics_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
