"""Pure numpy model kernels (no Spark imports).

These implement the exact numeric semantics of the reference's model family
(SURVEY.md §2.2) so Spark-side operators can call them inside vectorized
pandas UDFs.
"""

from modelardb_dynamic_spark.models.error import (  # noqa: F401
    percentage_error,
    percentage_error_vec,
    outside_error_bound_vec,
)
from modelardb_dynamic_spark.models.kernels import (  # noqa: F401
    compress_run,
    pmc_prefix,
    swing_prefix,
    Segment,
)
from modelardb_dynamic_spark.models.gorilla import (  # noqa: F401
    gorilla_encode,
    gorilla_decode,
)
