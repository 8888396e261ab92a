"""S4 — opaque binary-file source for multimodal payloads.

≙ the reference's BFS blob-store reads for indexFile
(LuceneIndexBean.java:208,216: BfsFileSync.openRead): raw media files become
a Dataset of (url, payload) rows that feed the multimodal actor-pool stages
(pipelines/training.py::MultimodalFeatures) or the HTML extractor.  The file
path plays the external-id role exactly as the BFS path does in the
reference (LuceneIndexBean.java:210).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def read_binary_payloads(paths: str | list[str]) -> "ray.data.Dataset":
    """Distributed read of raw files → rows (url=file path, payload=bytes).

    Use small ``batch_size`` in downstream ``map_batches`` stages — payloads
    may be multi-MB each (SURVEY.md memory-aware guidance).
    """
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pa.compute.cast(batch["path"].combine_chunks(), pa.string()),
                "payload": pa.compute.cast(batch["bytes"].combine_chunks(), pa.binary()),
            }
        )

    return ds.map_batches(_shape, batch_format="pyarrow", zero_copy_batch=True)
