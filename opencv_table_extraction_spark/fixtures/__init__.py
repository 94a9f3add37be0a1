from .gen import gen_tables, write_fixture  # noqa: F401
