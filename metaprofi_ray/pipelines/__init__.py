"""Pipeline modules.  Importing the package installs the targeted filter
for Ray Data's benign zero-column empty-block schema warning (see
``metaprofi_ray.logutil``) — every pipeline here builds sort/groupby
graphs whose empty shuffle partitions trip it."""

from ..logutil import silence_empty_schema_warnings

silence_empty_schema_warnings()
