"""End-to-end parity for the reference's demo ruleset semantics
(example_rules/: Import + Rule + WhenRules + TextContains + BanUser +
LabelAdd; expected output shape example_rules/README.md:55-67)."""

import datetime

from pyspark.sql import types as T

from tests.helpers import run_parity

TS = datetime.datetime(2024, 3, 1, 12, 0, 0)

SCHEMA = T.StructType(
    [
        T.StructField("__row_id", T.LongType()),
        T.StructField("action_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField(
            "post",
            T.StructType([T.StructField("text", T.StringType())]),
        ),
    ]
)

SOURCES = {
    "main.sml": """
Require(rule=f'actions/{ActionName}.sml')
ActionName = GetActionName()
""",
    "models/base.sml": """
UserId: Entity[str] = EntityJson(type='User', path='$.user_id')
EventType: str = JsonData(path='$.event_type')
""",
    "models/post.sml": """
PostText: str = JsonData(path='$.post.text')
""",
    "actions/create_post.sml": """
Import(
  rules=[
    'models/base.sml',
    'models/post.sml',
  ]
)

ContainsHello = Rule(
  when_all=[
    EventType == 'create_post',
    TextContains(text=PostText, phrase='hello')
  ],
  description='Post contains the word "hello"',
)

WhenRules(
  rules_any=[ContainsHello],
  then=[
    BanUser(entity=UserId, comment='User said "hello"'),
    LabelAdd(entity=UserId, label='meow'),
  ],
)
""",
}


def _row(i, action, user, etype, text):
    return dict(
        __row_id=i,
        action_name=action,
        ts=TS,
        user_id=user,
        event_type=etype,
        post={"text": text} if text is not None else None,
    )


ROWS = [
    _row(0, "create_post", "user_1923", "create_post", "hello world"),
    _row(1, "create_post", "user_1", "create_post", "i wont say that word"),
    _row(2, "create_post", "user_2", "create_post", "HELLO there"),
    _row(3, "create_post", "user_3", "create_post", "says helloworld"),  # word boundary
    _row(4, "other_action", "user_4", "other", "hello"),  # Require gate false
    _row(5, "create_post", "user_5", "create_post", None),  # failed PostText
]


def test_demo_ruleset_parity(spark):
    results = run_parity(
        spark, SOURCES, ROWS, SCHEMA, check_error_count=False
    )
    # spot-check the canonical expectations from example_rules/README.md:55-67
    assert results[0]["ContainsHello"] is True
    assert results[0]["__ban_user"] == ['user_1923|User said "hello"']
    assert results[0]["__entity_label_mutations"] == ["User/meow/LabelStatus.ADDED"]
    assert results[1]["ContainsHello"] is False
    assert results[1]["__entity_label_mutations"] == []
    assert results[2]["ContainsHello"] is True  # case-insensitive
    assert results[3]["ContainsHello"] is False  # \b boundary
    assert results[4]["ContainsHello"] is None  # file not required for this action
    # failed dependency → None condition → falsey → rule is False
    # (collapsed-failure contract; the require_if gate above still nulls)
    assert results[5]["ContainsHello"] is False
