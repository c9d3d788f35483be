from parallelutilities_jl_spark.plans.productsplit import (  # noqa: F401
    ProductSection,
    ProductSpec,
    ProductSplit,
    TaskNotPresentError,
    ZipSplit,
    nelementsdroptake,
    partition_of_index,
    procrange_recast,
    whichproc,
    whichproc_localindex,
)
