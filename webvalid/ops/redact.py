"""PII redaction over text columns — email / phone masking with counts.

Pure streaming map built on Arrow's RE2 kernels
(count_substring_regex + replace_substring_regex) — vectorized,
stateless, no shuffle. DuckDB's regex engine is also RE2, so the same
patterns give value-exact SQL oracles (regexp_extract_all /
regexp_replace ... 'g').

Counting order matters and is part of the contract: emails are counted
and masked FIRST, then phones are counted on the email-redacted text —
mirrored exactly in the oracle.

No reference analogue; training-data-pipeline addition.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"
EMAIL_MASK = "[EMAIL]"
PHONE_MASK = "[PHONE]"


def redact_pii_batch(t: pa.Table, text_col: str,
                     keep: tuple[str, ...]) -> pa.Table:
    txt = t[text_col]
    n_emails = pc.count_substring_regex(txt, EMAIL_RE)
    stage1 = pc.replace_substring_regex(txt, EMAIL_RE, EMAIL_MASK)
    n_phones = pc.count_substring_regex(stage1, PHONE_RE)
    stage2 = pc.replace_substring_regex(stage1, PHONE_RE, PHONE_MASK)
    cols = {k: t[k] for k in keep}
    cols["n_emails"] = pc.cast(n_emails, pa.int64())
    cols["n_phones"] = pc.cast(n_phones, pa.int64())
    cols["red_text"] = stage2
    return pa.table(cols)


def redact_pii(ds, text_col: str = "text", keep: tuple[str, ...] = ("doc_id",)):
    """Dataset → (keep..., n_emails, n_phones, red_text)."""
    return ds.map_batches(
        lambda t: redact_pii_batch(t, text_col, tuple(keep)),
        batch_format="pyarrow")
