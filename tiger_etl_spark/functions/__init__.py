from tiger_etl_spark.functions.text import (  # noqa: F401
    extract_text_py,
    extract_text_udf,
    detect_lang,
    quality_score_cols,
    token_count,
    doc_fingerprint,
)
from tiger_etl_spark.functions import scalar  # noqa: F401
