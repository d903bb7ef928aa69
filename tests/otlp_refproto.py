
from google.protobuf import descriptor_pb2, descriptor_pool, message_factory, json_format

def build_pool():
    pool = descriptor_pool.DescriptorPool()
    f = descriptor_pb2.FileDescriptorProto()
    f.name = "otlp_subset.proto"; f.package = "otlp"; f.syntax = "proto3"
    T = descriptor_pb2.FieldDescriptorProto
    def msg(name):
        m = f.message_type.add(); m.name = name; return m
    def fld(m, num, name, type_, label=1, type_name=None):
        fd = m.field.add(); fd.number = num; fd.name = name; fd.type = type_; fd.label = label
        if type_name: fd.type_name = ".otlp." + type_name
        return fd
    av = msg("AnyValue")
    fld(av, 1, "string_value", T.TYPE_STRING); fld(av, 2, "bool_value", T.TYPE_BOOL)
    fld(av, 3, "int_value", T.TYPE_INT64); fld(av, 4, "double_value", T.TYPE_DOUBLE)
    fld(av, 5, "array_value", T.TYPE_MESSAGE, type_name="ArrayValue")
    fld(av, 6, "kvlist_value", T.TYPE_MESSAGE, type_name="KeyValueList")
    fld(av, 7, "bytes_value", T.TYPE_BYTES)
    oo = av.oneof_decl.add(); oo.name = "value"
    for fd in av.field: fd.oneof_index = 0
    arr = msg("ArrayValue"); fld(arr, 1, "values", T.TYPE_MESSAGE, 3, "AnyValue")
    kvl = msg("KeyValueList"); fld(kvl, 1, "values", T.TYPE_MESSAGE, 3, "KeyValue")
    kv = msg("KeyValue"); fld(kv, 1, "key", T.TYPE_STRING); fld(kv, 2, "value", T.TYPE_MESSAGE, 1, "AnyValue")
    res = msg("Resource"); fld(res, 1, "attributes", T.TYPE_MESSAGE, 3, "KeyValue"); fld(res, 2, "dropped_attributes_count", T.TYPE_UINT32)
    sc = msg("InstrumentationScope"); fld(sc,1,"name",T.TYPE_STRING); fld(sc,2,"version",T.TYPE_STRING); fld(sc,3,"attributes",T.TYPE_MESSAGE,3,"KeyValue"); fld(sc,4,"dropped_attributes_count",T.TYPE_UINT32)
    lr = msg("LogRecord")
    fld(lr,1,"time_unix_nano",T.TYPE_FIXED64)
    fld(lr,2,"severity_number",T.TYPE_INT32); fld(lr,3,"severity_text",T.TYPE_STRING)
    fld(lr,5,"body",T.TYPE_MESSAGE,1,"AnyValue"); fld(lr,6,"attributes",T.TYPE_MESSAGE,3,"KeyValue")
    fld(lr,7,"dropped_attributes_count",T.TYPE_UINT32); fld(lr,8,"flags",T.TYPE_FIXED32)
    fld(lr,9,"trace_id",T.TYPE_BYTES); fld(lr,10,"span_id",T.TYPE_BYTES)
    fld(lr,11,"observed_time_unix_nano",T.TYPE_FIXED64); fld(lr,12,"event_name",T.TYPE_STRING)
    sl = msg("ScopeLogs"); fld(sl,1,"scope",T.TYPE_MESSAGE,1,"InstrumentationScope"); fld(sl,2,"log_records",T.TYPE_MESSAGE,3,"LogRecord"); fld(sl,3,"schema_url",T.TYPE_STRING)
    rl = msg("ResourceLogs"); fld(rl,1,"resource",T.TYPE_MESSAGE,1,"Resource"); fld(rl,2,"scope_logs",T.TYPE_MESSAGE,3,"ScopeLogs"); fld(rl,3,"schema_url",T.TYPE_STRING)
    elr = msg("ExportLogsServiceRequest"); fld(elr,1,"resource_logs",T.TYPE_MESSAGE,3,"ResourceLogs")
    ev = msg("SpanEvent"); fld(ev,1,"time_unix_nano",T.TYPE_FIXED64); fld(ev,2,"name",T.TYPE_STRING); fld(ev,3,"attributes",T.TYPE_MESSAGE,3,"KeyValue"); fld(ev,4,"dropped_attributes_count",T.TYPE_UINT32)
    st = msg("Status"); fld(st,2,"message",T.TYPE_STRING); fld(st,3,"code",T.TYPE_INT32)
    sp = msg("Span")
    fld(sp,1,"trace_id",T.TYPE_BYTES); fld(sp,2,"span_id",T.TYPE_BYTES); fld(sp,3,"trace_state",T.TYPE_STRING)
    fld(sp,4,"parent_span_id",T.TYPE_BYTES); fld(sp,5,"name",T.TYPE_STRING); fld(sp,6,"kind",T.TYPE_INT32)
    fld(sp,7,"start_time_unix_nano",T.TYPE_FIXED64); fld(sp,8,"end_time_unix_nano",T.TYPE_FIXED64)
    fld(sp,9,"attributes",T.TYPE_MESSAGE,3,"KeyValue"); fld(sp,10,"dropped_attributes_count",T.TYPE_UINT32)
    fld(sp,11,"events",T.TYPE_MESSAGE,3,"SpanEvent"); fld(sp,12,"dropped_events_count",T.TYPE_UINT32)
    fld(sp,14,"dropped_links_count",T.TYPE_UINT32); fld(sp,15,"status",T.TYPE_MESSAGE,1,"Status")
    ss = msg("ScopeSpans"); fld(ss,1,"scope",T.TYPE_MESSAGE,1,"InstrumentationScope"); fld(ss,2,"spans",T.TYPE_MESSAGE,3,"Span"); fld(ss,3,"schema_url",T.TYPE_STRING)
    rs = msg("ResourceSpans"); fld(rs,1,"resource",T.TYPE_MESSAGE,1,"Resource"); fld(rs,2,"scope_spans",T.TYPE_MESSAGE,3,"ScopeSpans"); fld(rs,3,"schema_url",T.TYPE_STRING)
    etr = msg("ExportTraceServiceRequest"); fld(etr,1,"resource_spans",T.TYPE_MESSAGE,3,"ResourceSpans")
    pool.Add(f)
    return pool

def message_class(pool, name):
    return message_factory.GetMessageClass(pool.FindMessageTypeByName("otlp." + name))
