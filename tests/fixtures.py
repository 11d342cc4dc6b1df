"""Fixture lines ported from the reference test corpus
(/root/reference/tests/*.rs) — used by both oracle-level and pipeline-level
conformance tests."""

CLI_BASIC = [
    "2025-03-21 14:00:00,123 [ERROR] NullPointerException",
    "2025-03-21 14:01:00,456 [WARN] Some warning",
    "2025-03-21 14:02:00,789 [INFO] Application started",
]

TREND_LINES = [
    "2025-03-21 14:00:00,123 [ERROR] NullPointerException",
    "2025-03-21 15:01:00,456 [WARN] Some warning",
]

MALFORMED = [
    "This is not a properly formatted log line",
    "Another invalid log line without timestamp or level",
    "2025-03-21 Some malformed timestamp [INFO] Message",
]

NON_ASCII = [
    "2025-03-21 14:00:00,123 [ERROR] Résumé upload failed",
    "2025-03-21 14:01:00,456 [WARN] Ümlaut encoding issue",
    "2025-03-21 14:02:00,789 [INFO] 你好，世界! (Hello, world!)",
    "2025-03-21 14:03:00,012 [ERROR] エラーが発生しました (Error occurred)",
]

COMPLEX_REGEX_LINES = [
    "2025-03-21 14:00:00,123 [ERROR] NullPointerException",
    "2025-03-21 14:01:00,456 [WARN] Connection timeout",
    "2025-03-21 14:02:00,789 [INFO] User123 logged in",
    "2025-03-21 14:03:00,012 [ERROR] Invalid user ID: ABC-123-XYZ",
]

MIXED_FORMATS = [
    "2025-03-21 14:00:00,123 [ERROR] NullPointerException",
    '127.0.0.1 - - [21/Mar/2025:14:01:00 +0000] "GET /index.html HTTP/1.1" 200 1234',
    "ERROR: Database connection failed at 14:02:00",
    '{"timestamp":"2025-03-21T14:03:00.123Z","level":"ERROR","message":"Failed login attempt"}',
]

MULTI_MATCH = [
    "2025-03-21 14:00:00,123 [ERROR] Error Error Error multiple matches in one line",
]

LONG_LINE = [
    "2025-03-21 14:00:00,123 [ERROR] Very long error message: " + "A" * 10_000,
]

JSON_LINES = [
    '{"timestamp":"2025-03-21T14:00:00.123Z","level":"ERROR","service":"api","message":"Database connection failed","user_id":"12345"}',
    '{"timestamp":"2025-03-21T14:01:00.456Z","level":"WARN","service":"auth","message":"Slow query detected","user_id":"12345"}',
    '{"time":"2025-03-21T15:02:00.789Z","severity":"ERROR","service":"api","msg":"Connection timeout"}',
    '{"timestamp":"2025-03-21T15:03:00.111Z","level":"INFO","service":"payment","message":"Payment ok","user":{"id":"user_1","role":"admin"}}',
    '{"timestamp":"2025-03-21T16:04:00.222Z","level":"ERROR","service":"api","message":"NullPointerException in WebController","error":{"type":"NullPointerException","code":4242}}',
    "{not valid json at all",
]
