"""SML front-end: parser, validation, and the Spark expression compiler.

SML ("Some Madeup Language") is the reference's rule language — a
restricted Python subset (reference: docs/rules/README.md:3-13,
engine/ast/py_ast.py:70-91). Here it is parsed with CPython's ``ast``
module into a small grammar and compiled into a vectorized
``pyspark.sql.Column`` plan evaluated for a whole DataFrame at once.
"""

from osprey_spark.sml.parser import parse_source, SmlError
from osprey_spark.sml.compiler import RulesetCompiler, CompiledRuleset

__all__ = ["parse_source", "SmlError", "RulesetCompiler", "CompiledRuleset"]
