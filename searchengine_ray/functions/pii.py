"""PII scrubbing for training-data curation: redact emails / phone
numbers from a text column and count what was removed.

Pure streaming ``map_batches`` — the regex work runs in Arrow compute
kernels (RE2), which DuckDB also uses for ``regexp_replace`` /
``regexp_extract_all``, so the oracle semantics match pattern-for-
pattern. No state, no shuffle; at 100 TB this is a perfectly
pipelineable stage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def redact_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """(id columns kept) + redacted text + n_emails/n_phones counts."""
    import pyarrow.compute as pc

    s = pc.fill_null(batch[text_column], "")
    n_email = pc.count_substring_regex(s, EMAIL_RE)
    red = pc.replace_substring_regex(s, pattern=EMAIL_RE, replacement=EMAIL_TOKEN)
    n_phone = pc.count_substring_regex(red, PHONE_RE)
    red = pc.replace_substring_regex(red, pattern=PHONE_RE, replacement=PHONE_TOKEN)
    cols = {name: batch[name] for name in batch.column_names if name != text_column}
    cols["redacted"] = red
    cols["n_emails"] = n_email.cast(pa.int64())
    cols["n_phones"] = n_phone.cast(pa.int64())
    return pa.table(cols)


def redact_pii(ds, text_column: str = "text"):
    """Streaming redaction over a Dataset; see ``redact_batch``.

    Phones are counted/redacted AFTER email redaction (an email's
    digits can't double-count as a phone), mirroring a sequential
    ``regexp_replace`` chain in SQL."""
    return ds.map_batches(
        redact_batch, batch_format="pyarrow", fn_kwargs={"text_column": text_column}
    )
