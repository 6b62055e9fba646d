Feature: Boolean handling and WHERE coercion corners

  Scenario: WHERE on a stored boolean property
    Given an empty graph
    And having executed:
      """
      CREATE (:P {on: true, id: 1}), (:P {on: false, id: 2}), (:P {id: 3})
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.on RETURN p.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: NOT on a stored boolean keeps nulls out
    Given an empty graph
    And having executed:
      """
      CREATE (:P {on: true, id: 1}), (:P {on: false, id: 2}), (:P {id: 3})
      """
    When executing query:
      """
      MATCH (p:P) WHERE NOT p.on RETURN p.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |

  Scenario: Boolean expressions as RETURN values
    Given an empty graph
    When executing query:
      """
      RETURN 1 < 2 AS lt, NOT (1 < 2) AS nlt, (1 < 2) AND (3 < 4) AS both
      """
    Then the result should be, in any order:
      | lt   | nlt   | both |
      | true | false | true |

  Scenario: Boolean stored and read back preserves type
    Given an empty graph
    And having executed:
      """
      CREATE (:F {flag: true})
      """
    When executing query:
      """
      MATCH (f:F) RETURN f.flag = true AS yes, f.flag = false AS no
      """
    Then the result should be, in any order:
      | yes  | no    |
      | true | false |

  Scenario: Comparing booleans orders false before true
    Given an empty graph
    When executing query:
      """
      UNWIND [true, false, true] AS b RETURN b ORDER BY b
      """
    Then the result should be, in order:
      | b     |
      | false |
      | true  |
      | true  |

  Scenario: AND OR mixed short-circuit values
    Given an empty graph
    When executing query:
      """
      RETURN (false AND 1 / 0 = 1) AS safe_and, (true OR 1 / 0 = 1) AS safe_or
      """
    Then the result should be, in any order:
      | safe_and | safe_or |
      | false    | true    |

  Scenario: toBoolean roundtrip through toString
    Given an empty graph
    When executing query:
      """
      RETURN toBoolean(toString(true)) AS t, toBoolean(toString(false)) AS f
      """
    Then the result should be, in any order:
      | t    | f     |
      | true | false |

  Scenario: Nested NOT chains
    Given an empty graph
    When executing query:
      """
      RETURN NOT NOT true AS a, NOT NOT NOT true AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |

  Scenario: Equality chain on booleans
    Given an empty graph
    When executing query:
      """
      RETURN (1 = 1) = (2 = 2) AS same, (1 = 1) = (1 = 2) AS diff
      """
    Then the result should be, in any order:
      | same | diff  |
      | true | false |

  Scenario: WHERE true keeps all rows and WHERE false none
    Given an empty graph
    And having executed:
      """
      CREATE (:P {id: 1}), (:P {id: 2})
      """
    When executing query:
      """
      MATCH (p:P) WHERE true RETURN count(*) AS all_rows
      """
    Then the result should be, in any order:
      | all_rows |
      | 2        |
