"""Scalar / transform functions — the reference's closed 7-function registry
(pinot-core/.../operator/transform/function/TransformFunctionFactory.java:40-52)
plus the engine's extension points."""

from realtime_olap_spark.functions.transform import (
    add,
    datetimeconvert,
    div,
    mult,
    resolve_transform,
    sub,
    timeconvert,
    valuein,
)

__all__ = ["add", "sub", "mult", "div", "timeconvert", "datetimeconvert",
           "valuein", "resolve_transform"]
