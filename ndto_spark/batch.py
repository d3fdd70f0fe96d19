"""Arrow batch validators for binary image payloads.

The only rules that cannot be Catalyst expressions: decode the payload,
check decoded dimensions/format against the declared columns, and compare
decoded pixels against the deterministic per-row reference at PSNR ≥ 40 dB
(input_hint per-row invariant), plus exact caption equality. All run as
pandas UDFs over Arrow batches — zero per-row Python crossings, one
JVM→Python round trip per ~10k-row batch.

Design rule (SURVEY.md §4): image rules live in their OWN projection so the
metadata-only rules never force the parquet scan to read ``bytes``.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from . import codecs, fixtures

IMAGE_CHECK_TYPE = T.StructType(
    [
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("err", T.StringType()),
        T.StructField("fmt_detected", T.StringType()),
        T.StructField("w_actual", T.IntegerType()),
        T.StructField("h_actual", T.IntegerType()),
        T.StructField("psnr", T.DoubleType()),
        T.StructField("caption_ok", T.BooleanType()),
    ]
)

_ID_RE = re.compile(r"^img_[0-9a-f]{16}$")


def image_check_udf(seed: int, min_psnr: float = 40.0):
    """pandas UDF: (image_id, bytes, caption) → check struct.

    PSNR is computed against pixels regenerated from the row id embedded in
    image_id (fixtures.image_pixels) — the sandbox stand-in for 'the
    reference copy of this image'. Rows whose id cannot be parsed get
    psnr = NULL (unverifiable; the id rules flag those separately).
    """

    @pandas_udf(IMAGE_CHECK_TYPE)
    def check(image_id: pd.Series, data: pd.Series, caption: pd.Series) -> pd.DataFrame:
        # Per-row Python is kept to the three genuinely per-row steps:
        # payload decode, reference-pixel regen + PSNR, reference-caption
        # regen (each keyed by a per-row Philox stream). Everything else —
        # output bookkeeping, the id-pattern check, caption equality — is
        # preallocated-array / vectorized work (the round-2 row-at-a-time
        # dict appends measurably widened the Python-side critical path).
        n = len(image_id)
        decode_ok = np.zeros(n, dtype=bool)
        err = np.full(n, None, dtype=object)
        fmtd = np.full(n, None, dtype=object)
        wa = np.full(n, None, dtype=object)
        ha = np.full(n, None, dtype=object)
        ps = np.full(n, None, dtype=object)
        cap_ok = np.full(n, None, dtype=object)
        pixels_list: list[Optional[np.ndarray]] = [None] * n

        payloads = data.to_numpy(dtype=object, copy=False)
        caps = caption.to_numpy(dtype=object, copy=False)
        for i in range(n):
            payload = payloads[i]
            if payload is None:
                err[i] = "null payload"
                continue
            try:
                f, pix = codecs.decode(bytes(payload))
                pixels_list[i] = pix
                decode_ok[i] = True
                fmtd[i] = f
                ha[i] = int(pix.shape[0])
                wa[i] = int(pix.shape[1])
            except Exception as e:  # zlib.error / ValueError / struct.error
                err[i] = f"{type(e).__name__}: {e}"

        # vectorized: which rows carry a parseable id (rid recovers the
        # per-row reference stream; unparseable ids → psnr/caption NULL)
        valid = (
            image_id.fillna("").str.match(_ID_RE.pattern)
        ).to_numpy(dtype=bool, copy=False)
        for i in np.flatnonzero(valid):
            rid = int(image_id.iat[i][4:], 16)
            pix = pixels_list[i]
            if pix is not None:
                p = codecs.psnr(fixtures.image_pixels(seed, rid), pix)
                ps[i] = 1e9 if p == float("inf") else float(p)
            cap_ok[i] = bool(caps[i] == fixtures.caption_text(seed, rid))
        return pd.DataFrame(
            {
                "decode_ok": decode_ok,
                "err": err,
                "fmt_detected": fmtd,
                "w_actual": wa,
                "h_actual": ha,
                "psnr": ps,
                "caption_ok": cap_ok,
            }
        )

    return check


def image_batch_violations(
    df: DataFrame,
    seed: int,
    key: str = "image_id",
    min_psnr: float = 40.0,
) -> DataFrame:
    """Violation rows from the batch (bytes-dependent) checks.

    Output matches the runner's violation shape: (key, column, schema_path,
    keyword, description, partition_id). A row can carry several batch
    violations (they are independent physical checks, unlike the reference's
    single-value short-circuit — documented extension).
    """
    chk = image_check_udf(seed, min_psnr)(
        F.col(key), F.col("bytes"), F.col("caption")
    ).alias("chk")
    c = F.col("chk")
    entries = [
        F.when(
            ~c["decode_ok"],
            _v("bytes", "$.decode", "decode", F.concat(F.lit("Image payload does not decode: "), F.coalesce(c["err"], F.lit("unknown")))),
        ),
        F.when(
            c["decode_ok"] & ((c["w_actual"] != F.col("w")) | (c["h_actual"] != F.col("h"))),
            _v(
                "bytes",
                "$.dimensions",
                "dimensions",
                F.format_string(
                    "Decoded dimensions %dx%d do not match declared %dx%d",
                    c["w_actual"],
                    c["h_actual"],
                    F.col("w"),
                    F.col("h"),
                ),
            ),
        ),
        F.when(
            c["decode_ok"] & (c["fmt_detected"] != F.col("fmt")),
            _v(
                "bytes",
                "$.format",
                "format",
                F.format_string(
                    "Detected format %s does not match declared %s",
                    c["fmt_detected"],
                    F.col("fmt"),
                ),
            ),
        ),
        F.when(
            c["decode_ok"] & c["psnr"].isNotNull() & (c["psnr"] < min_psnr),
            _v(
                "bytes",
                "$.psnr",
                "psnr",
                F.format_string(
                    "Decoded pixels PSNR %.2f dB below required %.2f dB",
                    c["psnr"],
                    F.lit(float(min_psnr)),
                ),
            ),
        ),
        F.when(
            c["caption_ok"].isNotNull() & ~c["caption_ok"],
            _v("caption", "$.caption_equality", "caption_equality", F.lit("Caption does not match the reference caption")),
        ),
    ]
    annotated = df.select(
        F.col(key), F.col("w"), F.col("h"), F.col("fmt"), chk,
        F.spark_partition_id().alias("partition_id"),
    ).select(
        F.col(key),
        F.array_compact(F.array(*entries)).alias("violations"),
        "partition_id",
    )
    # explode_outer + post-filter (cf. runner._result_from_annotated): keeps
    # the optimizer from expanding the violations alias into an inferred
    # pre-Generate filter and re-evaluating the entry expressions per row
    return annotated.select(
        F.col(key), F.explode_outer("violations").alias("v"), "partition_id"
    ).filter(F.col("v").isNotNull()).select(
        key,
        F.col("v.column").alias("column"),
        F.col("v.schema_path").alias("schema_path"),
        F.col("v.keyword").alias("keyword"),
        F.col("v.description").alias("description"),
        "partition_id",
    )


def _v(column: str, path: str, keyword: str, description: Column) -> Column:
    return F.struct(
        F.lit(column).alias("column"),
        F.lit(path).alias("schema_path"),
        F.lit(keyword).alias("keyword"),
        description.cast("string").alias("description"),
    )
