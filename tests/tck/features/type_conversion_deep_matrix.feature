Feature: Type conversion deep matrix (toInteger/toFloat/toBoolean/toString)

  Scenario: toInteger of numeric strings
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('42') AS a, toInteger('-7') AS b
      """
    Then the result should be, in any order:
      | a  | b  |
      | 42 | -7 |

  Scenario: toInteger of a float truncates toward zero
    Given an empty graph
    When executing query:
      """
      RETURN toInteger(3.9) AS a, toInteger(-3.9) AS b
      """
    Then the result should be, in any order:
      | a | b  |
      | 3 | -3 |

  Scenario: toInteger of a float string truncates
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('3.9') AS a
      """
    Then the result should be, in any order:
      | a |
      | 3 |

  Scenario: toInteger of garbage is null
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('abc') AS a, toInteger('') AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: toInteger of null is null
    Given an empty graph
    When executing query:
      """
      RETURN toInteger(null) AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |

  Scenario: toInteger of an integer is identity
    Given an empty graph
    When executing query:
      """
      RETURN toInteger(5) AS a
      """
    Then the result should be, in any order:
      | a |
      | 5 |

  Scenario: toFloat of strings and integers
    Given an empty graph
    When executing query:
      """
      RETURN toFloat('2.5') AS a, toFloat(3) AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 2.5 | 3.0 |

  Scenario: toFloat of garbage is null
    Given an empty graph
    When executing query:
      """
      RETURN toFloat('pi') AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |

  Scenario: toBoolean of canonical strings
    Given an empty graph
    When executing query:
      """
      RETURN toBoolean('true') AS t, toBoolean('false') AS f,
             toBoolean('TRUE') AS tu
      """
    Then the result should be, in any order:
      | t    | f     | tu   |
      | true | false | true |

  Scenario: toBoolean of non-boolean text is null
    Given an empty graph
    When executing query:
      """
      RETURN toBoolean('yes') AS a, toBoolean('') AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: toBoolean of a boolean is identity
    Given an empty graph
    When executing query:
      """
      RETURN toBoolean(true) AS t, toBoolean(false) AS f
      """
    Then the result should be, in any order:
      | t    | f     |
      | true | false |

  Scenario: toString round trips each primitive
    Given an empty graph
    When executing query:
      """
      RETURN toString(7) AS i, toString(-0.5) AS f, toString(false) AS b,
             toString('s') AS s
      """
    Then the result should be, in any order:
      | i   | f      | b       | s   |
      | '7' | '-0.5' | 'false' | 's' |

  Scenario: toString of null is null
    Given an empty graph
    When executing query:
      """
      RETURN toString(null) AS s
      """
    Then the result should be, in any order:
      | s    |
      | null |

  Scenario: conversion chain string to int to float to string
    Given an empty graph
    When executing query:
      """
      RETURN toString(toFloat(toInteger('9'))) AS s
      """
    Then the result should be, in any order:
      | s     |
      | '9.0' |

  Scenario: conversions over a property column with mixed validity
    Given an empty graph
    And having executed:
      """
      CREATE (:CV {raw: '10'}), (:CV {raw: 'x'}), (:CV {raw: '30'})
      """
    When executing query:
      """
      MATCH (c:CV)
      RETURN sum(coalesce(toInteger(c.raw), 0)) AS total,
             count(toInteger(c.raw)) AS ok
      """
    Then the result should be, in any order:
      | total | ok |
      | 40    | 2  |

  Scenario: toInteger feeding arithmetic stays integral
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('4') * 2 + 1 AS r
      """
    Then the result should be, in any order:
      | r |
      | 9 |

  Scenario: toFloat comparison against an integer literal
    Given an empty graph
    When executing query:
      """
      RETURN toFloat('2.0') = 2 AS eq
      """
    Then the result should be, in any order:
      | eq   |
      | true |

  Scenario: toInteger of boolean is not defined and conversions of lists are errors or null
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('7 ') AS padded
      """
    Then the result should be, in any order:
      | padded |
      | 7      |

  Scenario: toString of a date value
    Given an empty graph
    When executing query:
      """
      RETURN toString(date('2024-12-31')) AS s
      """
    Then the result should be, in any order:
      | s            |
      | '2024-12-31' |

  Scenario: toString of a duration value
    Given an empty graph
    When executing query:
      """
      RETURN toString(duration({hours: 1, minutes: 30})) AS s
      """
    Then the result should be, in any order:
      | s         |
      | 'PT1H30M' |
