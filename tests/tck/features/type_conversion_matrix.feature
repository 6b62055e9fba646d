Feature: toInteger / toFloat / toBoolean / toString conversion matrix

  Scenario: toInteger parses integral strings
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('42') AS a, toInteger('-7') AS b, toInteger('0') AS c
      """
    Then the result should be, in any order:
      | a  | b  | c |
      | 42 | -7 | 0 |

  Scenario: toInteger truncates float strings and floats toward zero
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('4.9') AS a, toInteger(4.9) AS b, toInteger(-4.9) AS c
      """
    Then the result should be, in any order:
      | a | b | c  |
      | 4 | 4 | -4 |

  Scenario: toInteger of garbage is null
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('abc') AS a, toInteger('') AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: toInteger of booleans
    Given an empty graph
    When executing query:
      """
      RETURN toInteger(true) AS a, toInteger(false) AS b
      """
    Then the result should be, in any order:
      | a | b |
      | 1 | 0 |

  Scenario: toInteger of null is null
    Given an empty graph
    When executing query:
      """
      RETURN toInteger(null) AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: toInteger is identity on integers
    Given an empty graph
    When executing query:
      """
      RETURN toInteger(17) AS v
      """
    Then the result should be, in any order:
      | v  |
      | 17 |

  Scenario: toFloat parses numeric strings
    Given an empty graph
    When executing query:
      """
      RETURN toFloat('1.5') AS a, toFloat('-0.25') AS b, toFloat('3') AS c
      """
    Then the result should be, in any order:
      | a   | b     | c   |
      | 1.5 | -0.25 | 3.0 |

  Scenario: toFloat widens integers
    Given an empty graph
    When executing query:
      """
      RETURN toFloat(2) AS v
      """
    Then the result should be, in any order:
      | v   |
      | 2.0 |

  Scenario: toFloat of garbage or null is null
    Given an empty graph
    When executing query:
      """
      RETURN toFloat('x') AS a, toFloat(null) AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: toBoolean parses case-insensitively
    Given an empty graph
    When executing query:
      """
      RETURN toBoolean('true') AS a, toBoolean('FALSE') AS b, toBoolean('True') AS c
      """
    Then the result should be, in any order:
      | a    | b     | c    |
      | true | false | true |

  Scenario: toBoolean of garbage is null and identity on booleans
    Given an empty graph
    When executing query:
      """
      RETURN toBoolean('x') AS a, toBoolean(true) AS b, toBoolean(null) AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | true | null |

  Scenario: toString of numbers booleans and strings
    Given an empty graph
    When executing query:
      """
      RETURN toString(3) AS a, toString(1.5) AS b, toString(true) AS c, toString('s') AS d
      """
    Then the result should be, in any order:
      | a   | b     | c      | d   |
      | '3' | '1.5' | 'true' | 's' |

  Scenario: toString of null is null
    Given an empty graph
    When executing query:
      """
      RETURN toString(null) AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: conversion round trip integer through string
    Given an empty graph
    When executing query:
      """
      RETURN toInteger(toString(99)) AS v
      """
    Then the result should be, in any order:
      | v  |
      | 99 |

  Scenario: conversion chain float to int to string
    Given an empty graph
    When executing query:
      """
      RETURN toString(toInteger(toFloat('7.8'))) AS v
      """
    Then the result should be, in any order:
      | v   |
      | '7' |

  Scenario: toInteger over UNWIND of mixed parseability
    Given an empty graph
    When executing query:
      """
      UNWIND ['1', 'x', '3'] AS s RETURN toInteger(s) AS v ORDER BY v
      """
    Then the result should be, in order:
      | v    |
      | 1    |
      | 3    |
      | null |

  Scenario: whitespace strings do not parse as numbers
    Given an empty graph
    When executing query:
      """
      RETURN toInteger(' ') AS a, toFloat(' ') AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
