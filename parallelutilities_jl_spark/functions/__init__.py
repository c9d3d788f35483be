from parallelutilities_jl_spark.functions.codec import (  # noqa: F401
    idiv,
    imod,
)
