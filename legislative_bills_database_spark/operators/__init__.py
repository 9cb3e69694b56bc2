"""Composite dataflow operators (DataFrame-in → DataFrame-out).

Each operator is a declarative composition of built-in Spark relational
ops, so Catalyst keeps pushdown/pruning/broadcast selection; none of them
collect to the driver.
"""
