from .synthetic import (  # noqa: F401
    EXTRACTION_SPEC,
    make_page_row,
    skewed_pages_df,
    synthetic_pages_df,
)
