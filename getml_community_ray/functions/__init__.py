from .scalar import FLOAT_BINARY, FLOAT_UNARY, STRING_OPS, BOOL_OPS, apply_op, with_columns  # noqa: F401
