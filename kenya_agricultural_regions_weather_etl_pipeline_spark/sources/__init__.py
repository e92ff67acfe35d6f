from .tables import load_table, load_tables  # noqa: F401
from .regions import regions_df, AGRICULTURAL_REGIONS  # noqa: F401
