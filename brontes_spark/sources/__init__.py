from .testdata import TESTDATA_TABLES, load_table, load_events

__all__ = ["TESTDATA_TABLES", "load_table", "load_events"]
