from .tables import (iceberg_available, read_table, table_files,  # noqa: F401
                     table_files_iter)
