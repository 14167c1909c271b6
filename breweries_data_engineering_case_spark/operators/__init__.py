"""Composable DataFrame→DataFrame operators.

Each operator is a small, individually testable function mapping 1:1 to an
entry in the driver contract (``__spark_entry__.queries()``) and to a row of
SURVEY.md §2's inventory.
"""
