"""P1 column-mapping projection as DATA (SURVEY §2.3 P1).

The reference drives per-source projection through declarative
``TRANSFORMATION_MAPS`` (dataextractai/utils/config.py:302-417): each source
maps ``target_col -> source_col | lambda(row)`` and one generic engine applies
the map (data_transformation.py:16-28, normalize_api.py:90-102). Round 1
realized "rules are data" only for the family registry; this module restores
the projection tier: the maps below are pure data (JSON-serializable specs,
lambdas replaced by a tiny declarative grammar), and ``apply_projection_map``
is the one generic engine that compiles a spec to a Spark ``select``.

Spec grammar (everything the reference's maps actually use):
  "src_col"                      copy/rename from a source column
  {"lit": v}                     constant column (the ``lambda x: 'chase_visa'``
                                 source/type literals)
  {"float": "src"}               cast-to-float (chase_checking amount lambda)
  {"interest_credit": {...}}     the first_republic transaction_date lambda
                                 (config.py:368-373): description contains
                                 'INTEREST CREDIT' AND transaction_date null/
                                 empty -> statement_end_date else transaction_date

Scale note: the compiled plan is a single narrow ``select`` — column pruning
and pushdown see straight through it; adding a source is a data edit, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mirrors config.py:302-417 TRANSFORMATION_MAPS (targets -> spec)
PROJECTION_MAPS: dict[str, dict[str, object]] = {
    "wellsfargo_mastercard": {
        "transaction_date": "transaction_date",
        "description": "description",
        "amount": "amount",
        "file_path": "file_path",
        "source": {"lit": "wellsfargo_mastercard"},
        "transaction_type": {"lit": "Credit Card"},
    },
    "amazon": {
        "transaction_date": "order_placed",
        "description": "description",
        "amount": "amount",
        "file_path": "file_path",
        "source": {"lit": "amazon"},
        "transaction_type": {"lit": "Credit Card"},
    },
    "bofa_bank": {
        "transaction_date": "date",
        "description": "description",
        "amount": "amount",
        "file_path": "file_path",
        "source": {"lit": "bofa_bank"},
        "transaction_type": {"lit": "Debit/Check"},
    },
    "bofa_visa": {
        "transaction_date": "transaction_date",
        "description": "description",
        "amount": "amount",
        "file_path": "file_path",
        "source": {"lit": "bofa_visa"},
        "transaction_type": {"lit": "Credit Card"},
    },
    "chase_visa": {
        "transaction_date": "date",
        "description": "merchant_name_or_transaction_description",
        "amount": "amount",
        "file_path": "file_path",
        "source": {"lit": "chase_visa"},
        "transaction_type": {"lit": "Credit Card"},
    },
    "wellsfargo_bank": {
        "transaction_date": "date",
        "description": "description",
        "amount": "amount",
        "file_path": "file_path",
        "source": {"lit": "wellsfargo_bank"},
        "transaction_type": {"lit": "Debit/Check"},
    },
    "wellsfargo_visa": {
        "transaction_date": "transaction_date",
        "description": "description",
        "amount": "amount",
        "file_path": "file_path",
        "source": {"lit": "wellsfargo_visa"},
        "transaction_type": {"lit": "Credit Card"},
    },
    "wellsfargo_bank_csv": {
        "transaction_date": "transaction_date",
        "description": "description",
        "amount": "amount",
        "file_path": "source_file",
        "source": {"lit": "wellsfargo_bank_csv"},
        "transaction_type": "transaction_type",
    },
    "first_republic_bank": {
        # config.py:368-373: INTEREST CREDIT rows with a null/empty
        # transaction_date take statement_end_date (R24 as map data)
        "transaction_date": {
            "interest_credit": {
                "description": "description",
                "transaction_date": "transaction_date",
                "statement_end_date": "statement_end_date",
            }
        },
        "description": "description",
        "amount": "amount",
        "transaction_type": "transaction_type",
        "statement_start_date": "statement_start_date",
        "statement_end_date": "statement_end_date",
        "account_number": "account_number",
        "file_path": "file_path",
    },
    "chase_checking": {
        "transaction_date": "normalized_date",
        "description": "merchant_name_or_transaction_description",
        "amount": {"float": "amount"},
        "file_path": "file_path",
        "source": {"lit": "chase_checking"},
        "transaction_type": {"lit": "Debit/Check"},
        "account_number": "account_number",
    },
    "capitalone_csv": {
        "transaction_date": "transaction_date",
        "description": "description",
        "amount": "amount",
        "file_path": "source_file",
        "source": {"lit": "capitalone_csv"},
        "transaction_type": "transaction_type",
        "account_number": "card_no",
    },
}


def compile_spec(spec: object) -> F.Column:
    """One spec entry -> one Column expression (the whole engine)."""
    if isinstance(spec, str):
        return F.col(spec)
    if isinstance(spec, dict):
        if "lit" in spec:
            return F.lit(spec["lit"])
        if "float" in spec:
            return F.coalesce(F.col(spec["float"]).cast("double"), F.lit(0.0))
        if "interest_credit" in spec:
            s = spec["interest_credit"]
            desc, td, end = (s["description"], s["transaction_date"], s["statement_end_date"])
            return F.when(
                F.col(desc).contains("INTEREST CREDIT")
                & (F.col(td).isNull() | (F.col(td) == "")),
                F.col(end),
            ).otherwise(F.col(td))
    raise ValueError(f"unknown projection spec: {spec!r}")


def apply_projection_map(
    df: DataFrame, source: str, maps: dict[str, dict[str, object]] | None = None
) -> DataFrame:
    """The generic engine (data_transformation.py:16-28 analog): project a
    parser-output frame to its mapped schema, map resolved by source name."""
    spec = (maps or PROJECTION_MAPS)[source]
    return df.select(*[compile_spec(s).alias(target) for target, s in spec.items()])
