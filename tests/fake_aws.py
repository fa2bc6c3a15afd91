"""Contract-faithful in-memory fakes of the boto3 S3 / DynamoDB client
surface that S3Cas / DynamoCas consume (sources/manifest.py). These are
NOT mocks that record calls — each fake encodes its store's actual
consistency contract, so the adapter logic is genuinely exercised:

* FakeS3Client — strong read-after-write LIST/GET (post-2020 S3),
  ``If-None-Match: *`` put-if-absent raising a 412
  ``PreconditionFailed`` ClientError when the key exists, paginated
  ``list_objects_v2`` (tiny page size so the adapter MUST follow
  continuation tokens), and deterministic injection of the 409
  ``ConditionalRequestConflict`` ambiguity: every Nth conditional put
  raises 409, alternating between NOT applying the put and APPLYING it
  anyway — per AWS docs both outcomes are possible, and an adapter that
  guesses instead of reading the marker back will either lose a commit
  or double-apply one.
* FakeDynamoClient — conditional put/update raising
  ``ConditionalCheckFailedException``, plus honest eventual-consistency:
  a ``get_item`` WITHOUT ``ConsistentRead=True`` may serve the previous
  value (so an adapter that forgets the flag reads stale versions).
* FakeGcsClient — google-cloud-storage shape for GcsCas:
  ``ifGenerationMatch=0`` put-if-absent raising a 412-coded error
  (definitive — GCS has no S3-style ambiguous 409), strongly
  consistent listing.

Both are thread-safe (the CAS race suites hammer them from many
threads) and raise exceptions shaped like botocore's ClientError (an
``exc.response["Error"]["Code"]`` dict) without importing botocore.
"""

from __future__ import annotations

import io
import threading


class FakeClientError(Exception):
    """botocore.exceptions.ClientError shape: carries .response with
    Error.Code + an HTTP status, which is all the adapters inspect."""

    def __init__(self, code: str, status: int, op: str):
        super().__init__(f"An error occurred ({code}) when calling {op}")
        self.response = {
            "Error": {"Code": code, "Message": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


class FakeS3Client:
    def __init__(self, page_size: int = 2, conflict_every: int = 0):
        self._objects: dict[tuple[str, str], bytes] = {}
        self._lock = threading.Lock()
        self.page_size = page_size
        # inject a 409 on every Nth If-None-Match put (0 = never);
        # alternates applied/not-applied to cover both 409 outcomes
        self.conflict_every = conflict_every
        self._cond_puts = 0
        self._conflict_applied_next = True
        self.calls: dict[str, int] = {}

    def _count(self, op: str) -> None:
        self.calls[op] = self.calls.get(op, 0) + 1

    def put_object(self, Bucket: str, Key: str, Body: bytes = b"", **kw):
        with self._lock:
            self._count("put_object")
            conditional = kw.get("IfNoneMatch") == "*"
            k = (Bucket, Key)
            if conditional:
                if k in self._objects:
                    raise FakeClientError("PreconditionFailed", 412, "PutObject")
                self._cond_puts += 1
                if self.conflict_every and self._cond_puts % self.conflict_every == 0:
                    # ambiguous outcome: sometimes the put landed anyway
                    if self._conflict_applied_next:
                        self._objects[k] = bytes(Body)
                    self._conflict_applied_next = not self._conflict_applied_next
                    raise FakeClientError(
                        "ConditionalRequestConflict", 409, "PutObject"
                    )
            self._objects[k] = bytes(Body)
            return {"ResponseMetadata": {"HTTPStatusCode": 200}}

    def get_object(self, Bucket: str, Key: str):
        with self._lock:
            self._count("get_object")
            k = (Bucket, Key)
            if k not in self._objects:
                raise FakeClientError("NoSuchKey", 404, "GetObject")
            return {"Body": io.BytesIO(self._objects[k])}

    def delete_object(self, Bucket: str, Key: str):
        with self._lock:
            self._count("delete_object")
            self._objects.pop((Bucket, Key), None)
            return {"ResponseMetadata": {"HTTPStatusCode": 204}}

    def list_objects_v2(
        self, Bucket: str, Prefix: str = "", ContinuationToken: str | None = None
    ):
        with self._lock:
            self._count("list_objects_v2")
            keys = sorted(
                key for (b, key) in self._objects if b == Bucket and key.startswith(Prefix)
            )
        start = int(ContinuationToken) if ContinuationToken else 0
        page = keys[start : start + self.page_size]
        resp = {"Contents": [{"Key": key} for key in page], "KeyCount": len(page)}
        if start + self.page_size < len(keys):
            resp["IsTruncated"] = True
            resp["NextContinuationToken"] = str(start + self.page_size)
        else:
            resp["IsTruncated"] = False
        return resp


class FakeDynamoClient:
    def __init__(self):
        # pk -> (current item, previous item) — the previous item is
        # what an eventually-consistent read may serve
        self._items: dict[str, tuple[dict, dict | None]] = {}
        self._lock = threading.Lock()
        self.calls: dict[str, int] = {}

    def _count(self, op: str) -> None:
        self.calls[op] = self.calls.get(op, 0) + 1

    def get_item(self, TableName: str, Key: dict, ConsistentRead: bool = False):
        with self._lock:
            self._count("get_item")
            pk = Key["pk"]["S"]
            if pk not in self._items:
                return {}
            cur, prev = self._items[pk]
            if not ConsistentRead and prev is not None:
                # honest eventual consistency: stale value served once
                self._items[pk] = (cur, None)
                return {"Item": dict(prev)}
            return {"Item": dict(cur)}

    def put_item(self, TableName: str, Item: dict, ConditionExpression: str = "", **kw):
        with self._lock:
            self._count("put_item")
            pk = Item["pk"]["S"]
            if "attribute_not_exists" in ConditionExpression and pk in self._items:
                raise FakeClientError(
                    "ConditionalCheckFailedException", 400, "PutItem"
                )
            prev = self._items[pk][0] if pk in self._items else None
            self._items[pk] = (dict(Item), prev)
            return {"ResponseMetadata": {"HTTPStatusCode": 200}}

    def update_item(
        self,
        TableName: str,
        Key: dict,
        UpdateExpression: str = "",
        ConditionExpression: str = "",
        ExpressionAttributeValues: dict | None = None,
        **kw,
    ):
        with self._lock:
            self._count("update_item")
            pk = Key["pk"]["S"]
            vals = ExpressionAttributeValues or {}
            cur = self._items.get(pk, (None, None))[0]
            if "version = :exp" in ConditionExpression:
                exp = vals[":exp"]["N"]
                if cur is None or cur.get("version", {}).get("N") != exp:
                    raise FakeClientError(
                        "ConditionalCheckFailedException", 400, "UpdateItem"
                    )
            if cur is None:
                raise FakeClientError("ValidationException", 400, "UpdateItem")
            new = dict(cur)
            # SET version = :new is the only expression the adapter uses
            assert UpdateExpression.strip() == "SET version = :new"
            new["version"] = dict(vals[":new"])
            self._items[pk] = (new, cur)
            return {"ResponseMetadata": {"HTTPStatusCode": 200}}

    def delete_item(self, TableName: str, Key: dict, **kw):
        with self._lock:
            self._count("delete_item")
            self._items.pop(Key["pk"]["S"], None)
            return {"ResponseMetadata": {"HTTPStatusCode": 200}}

    def scan(
        self,
        TableName: str,
        FilterExpression: str = "",
        ExpressionAttributeValues: dict | None = None,
        ExclusiveStartKey: dict | None = None,
        **kw,
    ):
        # one-page scan with begins_with(pk, :p) — the only filter the
        # adapter's blob listing uses; pagination contract preserved
        # (LastEvaluatedKey absent = done)
        with self._lock:
            self._count("scan")
            vals = ExpressionAttributeValues or {}
            assert FilterExpression.strip() == "begins_with(pk, :p)"
            pfx = vals[":p"]["S"]
            items = [
                dict(cur)
                for pk, (cur, _) in sorted(self._items.items())
                if pk.startswith(pfx)
            ]
            return {"Items": items}


class FakeGcsPreconditionFailed(Exception):
    """google.api_core.exceptions.PreconditionFailed shape: .code == 412."""

    code = 412


class FakeGcsNotFound(Exception):
    """google.api_core.exceptions.NotFound shape: .code == 404."""

    code = 404


class _FakeGcsBlob:
    def __init__(self, store, lock, name):
        self._store, self._lock, self.name = store, lock, name

    def upload_from_string(self, data, if_generation_match=None, **kw):
        if isinstance(data, str):
            data = data.encode()
        with self._lock:
            if if_generation_match == 0 and self.name in self._store:
                raise FakeGcsPreconditionFailed(
                    f"412 object {self.name} already exists"
                )
            self._store[self.name] = bytes(data)

    def delete(self):
        with self._lock:
            if self.name not in self._store:
                raise FakeGcsPreconditionFailed(f"404 {self.name}")
            del self._store[self.name]

    def download_as_bytes(self):
        with self._lock:
            if self.name not in self._store:
                raise FakeGcsNotFound(f"404 {self.name}")
            return self._store[self.name]


class _FakeGcsBucket:
    def __init__(self, store, lock):
        self._store, self._lock = store, lock

    def blob(self, name):
        return _FakeGcsBlob(self._store, self._lock, name)


class FakeGcsClient:
    """google-cloud-storage Client surface GcsCas consumes: strongly
    consistent listing, ifGenerationMatch=0 put-if-absent raising a
    412-coded error — definitive, no S3-style ambiguous 409."""

    def __init__(self):
        self._store: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def bucket(self, name):
        return _FakeGcsBucket(self._store, self._lock)

    def list_blobs(self, bucket, prefix=""):
        with self._lock:
            names = sorted(n for n in self._store if n.startswith(prefix))
        return [_FakeGcsBlob(self._store, self._lock, n) for n in names]
