"""Operator library: each module re-expresses one family from SURVEY.md §2
as idiomatic DataFrame/Catalyst compositions."""
