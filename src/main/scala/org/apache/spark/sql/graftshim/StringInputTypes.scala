package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{AbstractDataType, LongType, StringType}

/** Declares a single string argument with implicit casts, from inside
  * the `org.apache.spark.sql` scope — Spark 4 marks `AbstractDataType`
  * `private[sql]`, so an external expression cannot override
  * `inputTypes` directly (same technique as [[Shim]]).
  */
trait StringInputTypes extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
}

/** Single bigint argument, same rationale as [[StringInputTypes]]. */
trait LongInputTypes extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
}
