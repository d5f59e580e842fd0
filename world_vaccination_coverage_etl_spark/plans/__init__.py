from .pipeline import (
    SchemaDriftError,
    discover_coverage_columns,
    melt_wide_to_tidy,
    clean_immunization,
    run_etl,
    assert_unique_key,
)
from .analytics import (
    coverage_series,
    dimension_index,
    antigens_for_country,
    series_kpis,
    window_compare,
)

__all__ = [
    "SchemaDriftError",
    "discover_coverage_columns",
    "melt_wide_to_tidy",
    "clean_immunization",
    "run_etl",
    "assert_unique_key",
    "coverage_series",
    "dimension_index",
    "antigens_for_country",
    "series_kpis",
    "window_compare",
]
