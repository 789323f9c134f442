"""Composable DataFrame operators (SURVEY.md §2).

Each module exposes pure DataFrame→DataFrame functions plus a
``build(spark, sf_dir, ctx)`` convenience that wires them to the driver
star schema. All operators are Catalyst-friendly: built-in functions only,
explicit aliases on every computed column (oracle contract), no Python
UDFs outside the explicitly-marked extension slow paths.
"""
