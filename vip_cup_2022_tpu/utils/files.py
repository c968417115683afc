"""Dataset-file collectors (tfimm train/utils.py:36-160 parity).

``collect_files_with_suffix`` recurses local directories (and accepts mixed
lists of files/dirs); ``s3://`` URLs go through a gated boto3 import — this
environment has no egress, so the S3 branch raises a clear error instead of
failing inside a client library.
"""
from __future__ import annotations

from pathlib import Path
from typing import Iterable, List, Tuple, Union

TFRECORD_SUFFIXES = (".tfrecord", ".tfrec")


def collect_tfrecord_files(data_dir) -> List[str]:
    """All tfrecord files under ``data_dir`` (file / dir / iterable of both)."""
    return collect_files_with_suffix(data_dir, TFRECORD_SUFFIXES)


def collect_files_with_suffix(
    data_dir: Union[None, str, Path, Iterable],
    suffix: Union[str, Tuple[str, ...]],
) -> List[str]:
    """All files with the given suffix(es) in the locations of ``data_dir``;
    directories recurse, iterables flatten, results sort (reference
    train/utils.py:53-80 semantics)."""
    suffix = (suffix,) if isinstance(suffix, str) else tuple(suffix)
    matching: List[str] = []
    if data_dir is None:
        return matching
    if isinstance(data_dir, (list, tuple, set)):
        for d in data_dir:
            matching.extend(collect_files_with_suffix(d, suffix))
        return sorted(matching)
    data_dir = str(data_dir)
    if data_dir.startswith("s3://"):
        matching = _collect_s3_files(data_dir, suffix)
    else:
        matching = _collect_local_files(data_dir, suffix)
    return sorted(matching)


def _collect_local_files(data_dir: str, suffix: Tuple[str, ...]) -> List[str]:
    path = Path(data_dir)
    if path.suffix in suffix:
        return [str(path)]
    if path.is_dir():
        return [str(f) for s in suffix for f in path.rglob(f"*{s}")]
    return []


def _collect_s3_files(data_dir: str, suffix: Tuple[str, ...]) -> List[str]:
    if data_dir.endswith(suffix):
        return [data_dir]
    try:
        import boto3  # noqa: F401 — gated: S3 listing needs the AWS SDK
    except ImportError as e:
        raise NotImplementedError(
            "S3 file collection requires boto3, which is not installed in "
            "this (no-egress) environment; pass local paths instead"
        ) from e
    bucket, _, prefix = data_dir[len("s3://"):].partition("/")
    s3 = boto3.client("s3")
    keys: List[str] = []
    kwargs = {"Bucket": bucket, "Prefix": prefix}
    while True:
        resp = s3.list_objects_v2(**kwargs)
        for obj in resp.get("Contents", []):
            if obj["Key"].endswith(suffix):
                keys.append(f"s3://{bucket}/{obj['Key']}")
        if not resp.get("IsTruncated"):
            break
        kwargs["ContinuationToken"] = resp["NextContinuationToken"]
    return keys
