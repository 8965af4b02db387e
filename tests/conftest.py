"""Shared fixtures.

``refmod`` imports the reference's pure-function modules from
/root/reference (read-only) for differential testing. Two of its deps are
absent in this sandbox and get stubbed:

- ``jellyfish``  -> our own unrestricted Damerau-Levenshtein. This makes
  the D-L *pipeline* differential (street_compare etc. around it) while
  D-L itself is property-tested against an independent brute-force oracle
  in test_textnorm.py.
- ``geopy``      -> haversine stand-in (only utils.py module import needs it).

The reference modules are used for TESTS ONLY; no engine code touches them.
"""

from __future__ import annotations

import sys
import types

import pytest


@pytest.fixture(scope="session")
def refmod():
    from nominatimwrapper_spark.functions.textnorm import damerau_levenshtein

    jf = types.ModuleType("jellyfish")
    jf.damerau_levenshtein_distance = damerau_levenshtein
    sys.modules.setdefault("jellyfish", jf)

    geopy = types.ModuleType("geopy")
    geopy_distance = types.ModuleType("geopy.distance")

    class _Dist:
        def __init__(self, a, b):
            from nominatimwrapper_spark.functions.geo import haversine_km

            self.km = haversine_km(a[0], a[1], b[0], b[1])

    geopy_distance.distance = _Dist
    geopy.distance = geopy_distance
    sys.modules.setdefault("geopy", geopy)
    sys.modules.setdefault("geopy.distance", geopy_distance)

    sys.path.insert(0, "/root/reference")
    import check_result_utils  # noqa: F401
    import utils  # noqa: F401
    import transformers  # noqa: F401

    ns = types.SimpleNamespace(
        check_result_utils=check_result_utils, utils=utils, transformers=transformers
    )
    yield ns
    sys.path.remove("/root/reference")


@pytest.fixture(scope="session")
def spark():
    from nominatimwrapper_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="nwspark-tests", shuffle_partitions=4)
    yield s
