"""Thematic query packages (round-7 consolidation of the numbered query
tranches): dedup, retrieval, text, sketches, stats, timeseries, eval,
events, multimodal, operational — plus _shared leaf constants.

Modules register their queries into kafka_streams_example_spark.registry
at import time; the registry imports them (text first: two modules patch
oracles that reference text-registered entries) and then reorders the
registry to the frozen canonical order in query_order.py, so the physical
layout here has no effect on the driver's verification window.
"""
