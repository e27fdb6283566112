"""Driver-side ingest: HTTP ZIP landing + CSV extraction (SURVEY.md §2.1
S1/S2; reference `extract.py:11-44`).

ZIPs are not splittable, so ingest is deliberately a driver/landing-zone
concern, kept OUT of the executor path: download → unzip to a landing dir →
hand the extracted CSV paths to the distributed scan (readers.read_tse_csv).
At real scale this step belongs to an upstream fetcher writing to object
storage; the interface here is the same. For many-member / many-archive
feeds, `sources/zipsource.py` (the `zipcsv` Python DataSource) skips the
extraction entirely and scans members executor-parallel straight out of
the archives.

Fidelity with the reference:
- streamed download in 8 KiB chunks (`extract.py:28`)
- skip-if-cached unless force (`extract.py:19`)
- consolidated-file pruning (`extract.py:43-44`) via readers.prune_consolidated
"""

from __future__ import annotations

import os
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from politicamente_etl_spark.sources.readers import prune_consolidated, read_tse_csv

CHUNK_SIZE = 8192  # reference `extract.py:28`

# TSE CDN bases (reference `config.py:18-19`) — public URLs.
TSE_CAND_BASE_URL = "https://cdn.tse.jus.br/estatistica/sead/odsele/consulta_cand"
TSE_VOTES_BASE_URL = (
    "https://cdn.tse.jus.br/estatistica/sead/odsele/votacao_candidato_munzona"
)


def download_zip(
    url: str,
    dest_path: str,
    force: bool = False,
    fetcher: Callable[[str], "object"] | None = None,
) -> str:
    """Stream a ZIP to the landing dir, 8 KiB chunks, skip if cached
    (`extract.py:19-31`). `fetcher` is injectable for tests/offline; the
    default uses requests (import-gated: absent in minimal images)."""
    if os.path.exists(dest_path) and not force:
        return dest_path
    if fetcher is None:
        try:
            import requests
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "requests not available; pass fetcher= or pre-place the ZIP"
            ) from e

        def fetcher(u: str):
            r = requests.get(u, stream=True, timeout=120)
            r.raise_for_status()
            return r.iter_content(chunk_size=CHUNK_SIZE)

    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    tmp = dest_path + ".part"
    with open(tmp, "wb") as f:
        for chunk in fetcher(url):
            f.write(chunk)
    os.replace(tmp, dest_path)  # atomic: no half-written cache hits
    return dest_path


def extract_csvs(
    zip_path: str, prefix: str, year: int, landing_dir: str
) -> list[str]:
    """Enumerate ZIP members, apply consolidated-file pruning (S2), extract
    the selected CSVs to the landing dir, return their paths."""
    os.makedirs(landing_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as z:
        members = prune_consolidated(z.namelist(), prefix, year)
        out = []
        for m in members:
            z.extract(m, landing_dir)
            out.append(os.path.join(landing_dir, m))
    return out


def get_tse_data(
    spark: SparkSession,
    year: int,
    base_url: str,
    file_prefix: str,
    schema: StructType,
    data_dir: str = "data",
    force_download: bool = False,
    fetcher: Callable[[str], "object"] | None = None,
) -> DataFrame | None:
    """The reference's `get_tse_data_as_dataframe` (`extract.py:11-36`)
    recomposed: land the ZIP, extract+prune CSVs, return ONE distributed
    scan over all selected files (the multi-path read is the UNION ALL,
    S4). Returns None when no CSVs are found — the P5 null-guard contract."""
    zip_path = os.path.join(data_dir, f"{file_prefix}_{year}.zip")
    url = f"{base_url}/{file_prefix}_{year}.zip"
    download_zip(url, zip_path, force=force_download, fetcher=fetcher)
    landing = os.path.join(data_dir, f"{file_prefix}_{year}_csv")
    paths = extract_csvs(zip_path, file_prefix, year, landing)
    if not paths:
        return None
    return read_tse_csv(spark, paths, schema)
