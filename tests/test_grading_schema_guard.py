"""Guard: no oracle-paired query may emit a top-level complex column.

The official driver canonicalizes each result through pandas
``DataFrame.sort_values`` over every column before hashing. pandas
cannot factorize array/map cells (``TypeError: unhashable type:
'numpy.ndarray'``), so any oracle-paired query whose *output schema*
contains a top-level ArrayType or MapType column is ungradeable — the
exact failure that put ``fn_regexp_extract_all`` and
``text_embed_hash`` on the official red list in CORRECTNESS_r08 even
though their values were correct. (Top-level structs survive: Spark
rows arrive as ``Row`` — a tuple subclass, hashable — so pandas can
factorize them; arrays arrive as ndarray and maps as dict, both
unhashable.)

The sibling test_grading_dtypes.py mirrors the driver's *value
rendering*; this file mirrors the *sortability* requirement that the
rendering tests cannot see. The fix recipe for a violating query is
serialization at the select boundary — ``array_join``/``concat_ws`` on
the Spark side, ``array_to_string``/``list_aggregate`` in the oracle
(precedent: dedup_minhash, dedup.py) — never dropping the oracle.

Static schema check only: plans are constructed, never executed, so
the whole registry is covered in one cheap pass.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

import pro_etl_spark
from tests.conftest import SF_ORACLE

QUERIES = pro_etl_spark.get_queries()
ORACLES = pro_etl_spark.get_oracles()
PAIRED = sorted(set(QUERIES) & set(ORACLES))

#: types pandas sort_values cannot order as cells → ungradeable
#: (struct is NOT banned: Row is a hashable tuple subclass)
_BANNED = (T.ArrayType, T.MapType)


@pytest.mark.parametrize("name", PAIRED)
def test_oracle_paired_output_is_pandas_sortable(name, spark):
    df = QUERIES[name](spark, SF_ORACLE)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _BANNED)
    ]
    assert not bad, (
        f"{name} returns top-level complex column(s) {bad} — the "
        "driver's pandas sort_values canonicalizer cannot hash these "
        "(CORRECTNESS_r08 red-row class). Serialize with "
        "array_join/concat_ws + array_to_string in the oracle "
        "(see dedup_minhash / fn_regexp_extract_all)."
    )


def test_pandas_sort_rejects_array_cells():
    """Pin the assumption the guard rests on: pandas sort_values over
    an ndarray-cell column raises — if a future pandas makes this
    legal, the guard above can be relaxed."""
    import numpy as np

    df = pd.DataFrame({"a": [np.array([1, 2]), np.array([3])]})
    # single-column sorts raise ValueError ("The truth value of an
    # array..."); the driver's multi-column lexsort path raises
    # TypeError ("unhashable type") — either way, ungradeable
    with pytest.raises((TypeError, ValueError)):
        df.sort_values(["a"])
    df2 = pd.DataFrame({"a": [np.array([1, 2]), np.array([3])], "b": [1, 2]})
    with pytest.raises((TypeError, ValueError)):
        df2.sort_values(["a", "b"])
