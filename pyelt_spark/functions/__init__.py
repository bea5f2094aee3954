from pyelt_spark.functions.hashing import (  # noqa: F401
    HashRecipe,
    business_key,
    hash_key,
    hashdiff,
)
