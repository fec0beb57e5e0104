from pyp_etl_pipeline_spark.functions.nulls import is_invalid_value, is_valid_value, null_normalize
from pyp_etl_pipeline_spark.functions.text import (
    capital_case,
    collapse_whitespace,
    lower_key,
    normalize_offering_text,
    sanitize_string,
    strip_html,
    strip_punctuation,
    variant_normalize,
)
from pyp_etl_pipeline_spark.functions.validation import valid_business_name, valid_email
from pyp_etl_pipeline_spark.functions.scoring import (
    apply_match_penalties,
    band,
    confidence_class,
    containment_ratio,
    dice_token_score,
    ratio,
    token_set_ratio,
    tokens,
)

__all__ = [
    "is_invalid_value",
    "is_valid_value",
    "null_normalize",
    "capital_case",
    "collapse_whitespace",
    "lower_key",
    "normalize_offering_text",
    "sanitize_string",
    "strip_html",
    "strip_punctuation",
    "variant_normalize",
    "valid_business_name",
    "valid_email",
    "apply_match_penalties",
    "band",
    "confidence_class",
    "containment_ratio",
    "dice_token_score",
    "ratio",
    "token_set_ratio",
    "tokens",
]
