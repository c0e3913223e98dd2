from .audit import explain_string, has_operator, pushed_filters, read_schemas

__all__ = ["explain_string", "has_operator", "pushed_filters", "read_schemas"]
