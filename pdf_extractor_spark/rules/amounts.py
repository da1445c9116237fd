"""Amount rules R4 (cleaning) and R5 (sign normalization) — SURVEY.md §2.4.

Reference semantics:
  R4 clean  -> bofa_bank_parser.py:77-79, wellsfargo_mastercard_parser.py:588-589,
               capitalone_csv_parser.py:119-120
  R5 sign   -> data_transformation.py:31-83 (Decimal hop at :51-56),
               parsers_core/base.py:7-16
Float formatting for canonical output reproduces the reference's
``float(Decimal(str(x)))`` + Python ``repr`` path (SURVEY.md §4 determinism #2).
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation

_PARENS = re.compile(r"^\((.*)\)$")
# fast path: a plain decimal literal parses identically via float() and
# float(Decimal()) — both correctly round the same literal; the Decimal
# constructor is only needed for the exotic shapes (exponents, spellings
# like 'Infinity', underscore rejection) where the two differ
_SIMPLE_NUM = re.compile(r"^-?\d+(?:\.\d+)?$")

# keyword classes from data_transformation.py:31-49
CHARGE_KEYWORDS = ("debit", "charge", "withdrawal", "purchase")
CREDIT_KEYWORDS = ("credit", "payment", "deposit", "income")


def clean_amount(raw: str | float | int | None) -> float | None:
    """R4: strip ``$``/``,``, parenthesized -> negative, unparseable -> None.

    (bofa_bank_parser.py:77-79; parenthesized-negative is the standard
    accounting convention the reference's ``errors='coerce'`` path flattens
    to 0.0 — callers that need the 0.0 behaviour use ``clean_amount_or_zero``.)
    """
    if raw is None:
        return None
    if isinstance(raw, (int, float)):
        return float(raw)
    s = raw.strip()
    if not s:
        return None
    neg = False
    # regex-free parens test; the '\n' guard preserves the old ^\((.*)\)$
    # semantics exactly (no DOTALL: an embedded newline never matched)
    if len(s) >= 2 and s[0] == "(" and s[-1] == ")" and "\n" not in s:
        neg, s = True, s[1:-1]
    # plain replace beats the [$,] regex sub (two C scans, no engine setup)
    s = s.replace("$", "").replace(",", "").strip()
    if _SIMPLE_NUM.match(s):
        v = float(s)  # same correctly-rounded value as float(Decimal(s))
    else:
        try:
            v = float(Decimal(s))
        except (InvalidOperation, ValueError):
            return None
    return -v if neg else v


def coerce_amount_commas_only(raw: str | float | int | None) -> float:
    """Strict wf_bank_csv coerce (wellsfargo_bank_csv_parser.py:35-44):
    ``float(str(x).replace(',', ''))`` with 0.0 on ANY failure. Deliberately
    NARROWER than ``clean_amount_or_zero``: the reference's parse_amount
    strips commas only, so ``'$12.00'`` and ``'(45.00)'`` both coerce to
    0.0 here (pinned in tests/test_new_families.py) — using the wider
    cleaner for this family would be a fidelity divergence."""
    if isinstance(raw, (int, float)):
        return float(raw)
    try:
        return float(str(raw).replace(",", ""))
    except (ValueError, TypeError):
        return 0.0


def clean_amount_or_zero(raw: str | float | int | None) -> float:
    """R4 with coerce->0.0 (capitalone_csv_parser.py:119-120)."""
    v = clean_amount(raw)
    return 0.0 if v is None else v


def normalize_sign(
    amount: float | None,
    transaction_type: str | None,
    *,
    is_charge_positive: bool = False,
) -> float:
    """R5: charges negative, credits positive (data_transformation.py:31-83).

    - ``transaction_type`` containing a charge keyword and amount>0 -> negate
    - containing a credit keyword and amount<0 -> negate
    - inverted sources (``is_charge_positive=True``, e.g. Apple Card /
      Capital One, data_transformation.py:71-75) -> unconditional negate
    - None -> 0.0
    Uses a Decimal hop for exactness like data_transformation.py:51-56.
    """
    if amount is None:
        return 0.0
    # the reference's Decimal hop (str -> Decimal -> optional negate ->
    # float) is value-preserving: repr round-trips floats exactly and
    # negation is exact in both representations, so plain float negation
    # produces bit-identical results (property-pinned in
    # tests/test_rules_units.py::test_amount_fastpaths_equal_decimal_hop)
    a = float(amount)
    if is_charge_positive:
        return -a
    ttype = (transaction_type or "").lower()
    charge = any(k in ttype for k in CHARGE_KEYWORDS)
    credit = any(k in ttype for k in CREDIT_KEYWORDS)
    if a != a and (charge or credit):
        # the reference's Decimal hop raises here: Decimal('NaN') > 0 (and
        # < 0) signal InvalidOperation, so a NaN amount that reaches a sign
        # comparison must raise, not silently pass NaN through
        # (data_transformation.py:51-56; pinned in tests/test_rules_units.py)
        raise InvalidOperation("normalize_sign: NaN amount reaches sign comparison")
    if charge and a > 0:
        return -a
    if credit and a < 0:
        return -a
    return a


def format_amount(v: float | None) -> str:
    """Canonical amount rendering: Python ``repr`` of the Decimal-hopped float.

    This is the byte-parity formatting path (SURVEY.md §4 determinism #2):
    the SAME Python code runs in the oracle and inside the pandas UDF, so the
    string is identical on both sides. Never Spark's ``format_number``.

    For a float input the reference hop ``repr(float(Decimal(str(v))))`` is
    the identity of ``repr(v)`` — ``str``/``repr`` produce the shortest
    round-tripping literal, which Decimal and float re-parse to the same
    value (property-pinned). Non-float numerics still take the full hop.
    """
    if v is None:
        return ""
    if type(v) is float:
        return repr(v)
    return repr(float(Decimal(str(v))))
