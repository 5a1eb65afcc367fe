from .tabular import load_table, save_arrow, save_csv, save_parquet, to_table
