"""Python API for the graft isolation-forest library.

Mirrors the reference's Python surface
(reference: python/pyspark_iforest/ml/iforest.py:11-361) over the
``graft.iforest`` Scala classes via pyspark's Java wrapper machinery.
"""

from graft_iforest.iforest import IForest, IForestModel, IForestSummary

__all__ = ["IForest", "IForestModel", "IForestSummary"]
