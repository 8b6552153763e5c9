from next_plaid_spark.functions.vector import (  # noqa: F401
    dot,
    l2_norm,
    l2_normalize,
    cosine,
)
from next_plaid_spark.functions.text import (  # noqa: F401
    tokenize_unicode61,
    tokenize_trigram,
)
