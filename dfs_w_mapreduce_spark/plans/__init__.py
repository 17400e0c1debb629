"""Plan-inspection helpers: assert pushdown, broadcast, codegen."""
