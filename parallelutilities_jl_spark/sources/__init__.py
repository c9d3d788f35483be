from parallelutilities_jl_spark.sources.fixtures import (  # noqa: F401
    TABLES,
    load_table,
    register_all,
)
from parallelutilities_jl_spark.sources.ranges import (  # noqa: F401
    RangeSpec,
    rng,
)
