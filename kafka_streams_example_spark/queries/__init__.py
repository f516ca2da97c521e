"""Thematic query packages (round-7 consolidation of the numbered query
tranches): dedup, retrieval, text, sketches, stats, timeseries, eval,
events, multimodal, operational — plus _shared leaf constants.

Modules register their queries into kafka_streams_example_spark.registry
at import time; the registry imports them (text first: two modules patch
oracles that reference text-registered entries) and then reorders the
registry to the frozen canonical order in query_order.py, so the physical
layout here has no effect on the driver's verification window.
"""

# Importing ANY query module directly (e.g. `from ...queries.dedup import
# _INGEST_SPLIT` as the process's first engine import) must still run the
# registry's canonical module-import sequence first — cross-module oracle
# patches (stats patches an eval-registered oracle, text's patches, ...)
# assume it. The parent package initializes before any submodule, so this
# import makes every entry point equivalent to importing the registry.
# Benign when the registry itself triggered this init: the partially
# initialized module is already in sys.modules and no attribute is read.
from kafka_streams_example_spark import registry as _registry  # noqa: E402,F401
