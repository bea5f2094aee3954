from pyelt_spark.operators.dedup import latest_per_key  # noqa: F401
from pyelt_spark.operators.hubs import HubMerge, LinkMerge  # noqa: F401
from pyelt_spark.operators.scd2 import Scd2Merge, Scd2Table, ScdColumns  # noqa: F401
