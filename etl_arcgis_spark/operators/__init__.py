"""Operator modules. Each module registers its queries + oracles via
``etl_arcgis_spark.registry.query`` at import time; ``registry.load_all``
imports the full set."""
