from .fsst_source import FsstDataSource  # noqa: F401
from .fsst_source import register as register_fsst_source  # noqa: F401
from .tables import (iceberg_available, read_table, table_files,  # noqa: F401
                     table_files_iter)
