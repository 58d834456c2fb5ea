from .synthetic import EXTRACTION_SPEC, make_page_row, synthetic_pages_df  # noqa: F401
