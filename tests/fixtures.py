"""Golden fixtures — data (not code) from the reference's test resources.

Input rows: src/test/resources/input-data.csv:1-7
Expected matches: src/test/resources/expected-output.csv:1
Expected timeouts (side output): src/test/resources/expected-side-output.csv:1

7 events over 2 keys: key "2" completes A B B C within 40 minutes →
match; key "1" has A then B with the candidate top-up 2.5 h later →
partial times out → absence alert with empty topupDatetime.
"""

GOLDEN_INPUT_ROWS = [
    ("1", "2020-05-01 11:00:00", 13, 9),
    ("2", "2020-05-01 11:00:00", 11, 6),
    ("2", "2020-05-01 11:15:00", 6, 4),
    ("2", "2020-05-01 11:30:00", 4, 3),
    ("2", "2020-05-01 11:40:00", 3, 23),
    ("1", "2020-05-01 11:45:00", 9, 5),
    ("1", "2020-05-01 13:30:00", 5, 25),
]

EXPECTED_MATCHES = [("2", "2020-05-01 11:00:00", "2020-05-01 11:40:00")]
EXPECTED_TIMEOUTS = [("1", "2020-05-01 11:00:00", "")]

GOLDEN_INPUT_CSV = "\n".join(",".join(map(str, r)) for r in GOLDEN_INPUT_ROWS) + "\n"
