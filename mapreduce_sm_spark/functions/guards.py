"""Self-describing capacity guards for broadcast-DATA rows.

House pattern, same family as the bloom module's geometry guards
(functions/bloom.py): a contract whose violation would otherwise
surface as an opaque executor OOM or the 2 GB single-array limit gets
an explicit documented bound that raises a NAMED error telling the
operator which fallback path to use instead.

Used by the decontamination family (VERDICT r15 item 2): the streamed
and semantic decontamination probes collapse the ENTIRE distinct eval
gram / eval embedding set into a single broadcast row (collect_set /
collect_list scalar aggregate). That shape is the right 100 TB posture
ONLY while the eval suite stays corpus-size-CONSTANT (a fixed
benchmark suite, not a corpus slice); these guards make that
assumption a checked contract instead of a docstring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bounded_broadcast_array(
    col: Column, bound: int, *, op: str, fallback: str, typ: str
) -> Column:
    """Wrap a collapsed one-row array column so exceeding ``bound``
    elements raises a named contract error instead of an executor OOM.

    The guard rides the array column itself (the bloom-module idiom:
    raise_error inside the expression, cast back to the column's type)
    so it evaluates exactly where the broadcast row materializes — at
    action time, on the ACTUAL collapsed row. That is strictly stronger
    than a build-time driver count, which could pass and then go stale
    before the action runs.

    op:       the registered operator name, for the error message.
    fallback: the NAMED scale path the caller should switch to when the
              eval set outgrows a broadcast row.
    typ:      the column's DDL type string (raise_error yields NULL
              type; the cast keeps both when/otherwise branches typed).
    """
    return F.when(
        F.coalesce(F.size(col), F.lit(0)) <= F.lit(bound), col
    ).otherwise(
        F.raise_error(
            F.format_string(
                f"{op}: eval-set broadcast row exceeds its documented "
                f"bound ({bound} elements, got %s). The one-row "
                "broadcast-DATA probe assumes a corpus-size-CONSTANT "
                f"eval suite; for eval sets this large use the "
                f"{fallback} instead.",
                F.size(col),
            )
        ).cast(typ)
    )
